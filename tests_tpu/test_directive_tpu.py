"""On-chip parity for directive sources/mics on the fused TPU path.

Round 3 moved the Fourier-gain emission/capture weighting into the
kernels (``bounce_kernel._fourier_gain``); ``engine._fused_eligible`` now
routes directive configs — including the 3-virtual-mic spatial capture of
``spatial.py`` — through the mega kernel instead of the jnp oracle. The
mega kernel draws a different (on-core) sample stream, so parity vs the
oracle is statistical: total energy + coarse envelope, as in
``test_mega_parity.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu import spatial as sp
from realisticaudioraytracing2d_tpu.engine import (_fused_eligible,
                                                   trace_accumulate)
from realisticaudioraytracing2d_tpu.models.materials import AudioMaterial
from realisticaudioraytracing2d_tpu.models.scene import SceneBuilder
from realisticaudioraytracing2d_tpu.ops import directivity as dv
from realisticaudioraytracing2d_tpu.ops import ir as irm

SR = 48000
IR_LEN = 9600
KW = dict(n_rays=15000, max_bounces=5, sample_rate=SR, n_frames=16)


def _pair(params):
    room = art.rooms.smoll_room()
    key = jax.random.PRNGKey(11)
    fused = trace_accumulate(room.scene, params,
                             irm.IRState.zeros(IR_LEN, 1, 1), key,
                             backend="fused", **KW)
    oracle = trace_accumulate(room.scene, params,
                              irm.IRState.zeros(IR_LEN, 1, 1), key,
                              backend="jnp", **KW)
    return (np.asarray(fused.normalized())[0, :, 0],
            np.asarray(oracle.normalized())[0, :, 0])


def _envelope_close(a, b, win=240, tol=0.2):
    n = len(a) // win * win
    ea = a[:n].reshape(-1, win).sum(-1)
    eb = b[:n].reshape(-1, win).sum(-1)
    m = eb > eb.max() * 1e-3
    assert m.sum() > 10
    rel = np.abs(ea[m] - eb[m]) / eb[m]
    assert np.median(rel) < tol, np.median(rel)


def test_directive_routes_fused_on_tpu():
    room = art.rooms.smoll_room()
    p = art.TraceParams.make(room.source, room.listener,
                             room.listener_radius, 343.0, 1.0,
                             mic_directivity=dv.cardioid(0.3),
                             directivity=dv.cardioid(1.0))
    assert _fused_eligible(room.scene, p, IR_LEN)


def test_mega_mic_pattern_parity():
    room = art.rooms.smoll_room()
    p = art.TraceParams.make(room.source, room.listener,
                             room.listener_radius, 343.0, 1.0,
                             mic_directivity=dv.cardioid(0.7))
    fused, oracle = _pair(p)
    assert oracle.sum() > 0
    assert abs(fused.sum() - oracle.sum()) / oracle.sum() < 0.02
    _envelope_close(fused, oracle)


def test_mega_source_directivity_parity():
    room = art.rooms.smoll_room()
    p = art.TraceParams.make(room.source, room.listener,
                             room.listener_radius, 343.0, 1.0,
                             directivity=dv.figure_eight(0.5))
    fused, oracle = _pair(p)
    assert oracle.sum() > 0
    assert abs(fused.sum() - oracle.sum()) / oracle.sum() < 0.03
    _envelope_close(fused, oracle)


def test_spatial_capture_on_chip():
    # 3-virtual-mic capture through the mega kernel localizes the
    # direct sound and the wall echo (sign conventions survive the
    # in-kernel gain path on real hardware)
    m = AudioMaterial(absorption=0.1, scattering=0.0, transmission=0.0,
                      ior=1.0)
    b = SceneBuilder(n_bands=1)
    b.add_segment((10.0, -20.0), (10.0, 20.0), (-1.0, 0.0), m)
    scene = b.build()
    p = art.TraceParams.make(np.float32([0.0, 0.0]),
                             np.float32([5.0, 0.0]), listener_radius=0.5)
    ir, state = sp.trace_spatial(scene, p, jax.random.PRNGKey(3),
                                 n_rays=16384, max_bounces=2,
                                 sample_rate=8000, ir_length=2048,
                                 n_frames=4)
    assert int(state.frames) == 4
    ang = np.asarray(ir.arrival_angle())[0, :, 0]
    w = np.asarray(ir.w)[0, :, 0]
    direct_bin = int(np.floor(5.0 / 343.0 * 8000))
    echo_bin = int(np.floor(15.0 / 343.0 * 8000))
    db = slice(max(0, direct_bin - 3), direct_bin + 4)
    eb = slice(echo_bin - 3, echo_bin + 4)
    assert w[db].sum() > 0 and w[eb].sum() > 0
    assert abs(abs(ang[db][w[db].argmax()]) - np.pi) < 0.1
    assert abs(ang[eb][w[eb].argmax()]) < 0.1
    # W = ordinary omni IR, energy conservation of the split
    r = np.sqrt(np.asarray(ir.x) ** 2 + np.asarray(ir.y) ** 2)
    assert np.all(r <= np.asarray(ir.w) * (1 + 1e-3) + 1e-10)
