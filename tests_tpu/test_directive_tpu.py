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


def test_accel_directive_parity_on_chip():
    # the accel (cluster-early-out) kernel with directive source + mic:
    # statistical parity vs the oracle, as for the mega path — weighting
    # must not disturb the early-out sweeps
    room = art.rooms.smoll_room()
    p = art.TraceParams.make(room.source, room.listener,
                             room.listener_radius, 343.0, 1.0,
                             directivity=dv.cardioid(1.0),
                             mic_directivity=dv.cardioid(0.7))
    key = jax.random.PRNGKey(11)
    acc = trace_accumulate(room.scene, p, irm.IRState.zeros(IR_LEN, 1, 1),
                           key, backend="accel", **KW)
    oracle = trace_accumulate(room.scene, p,
                              irm.IRState.zeros(IR_LEN, 1, 1), key,
                              backend="jnp", **KW)
    a = np.asarray(acc.normalized())[0, :, 0]
    o = np.asarray(oracle.normalized())[0, :, 0]
    assert o.sum() > 0
    assert abs(a.sum() - o.sum()) / o.sum() < 0.03
    _envelope_close(a, o)


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


def test_multisource_per_source_aims_fused_parity():
    # one-launch rooms-mega mixdown with PER-SOURCE aims (a steered
    # pair) vs the vmapped jnp oracle: statistical parity on chip
    from realisticaudioraytracing2d_tpu.parallel.multisource import (
        trace_sources_mixdown)
    room = art.rooms.smoll_room()
    srcs = jnp.asarray([[0.0, -3.0], [1.0, -3.0]], jnp.float32)
    aims = jnp.asarray([dv.cardioid(0.0), dv.cardioid(2.0)], jnp.float32)
    p = art.TraceParams.make(srcs, room.listener, room.listener_radius,
                             343.0, 1.0)
    p = p._replace(directivity=aims,
                   mic_directivity=jnp.asarray(dv.cardioid(1.0)))
    key = jax.random.PRNGKey(5)
    kw = dict(n_rays=15000, max_bounces=5, sample_rate=SR,
              ir_length=IR_LEN)
    from realisticaudioraytracing2d_tpu.engine import _rooms_fused_eligible
    assert _rooms_fused_eligible(room.scene, p, IR_LEN)
    fused = np.asarray(trace_sources_mixdown(room.scene, p, key,
                                             backend="fused", **kw))
    oracle = np.asarray(trace_sources_mixdown(room.scene, p, key,
                                              backend="jnp", **kw))
    assert oracle.sum() > 0
    assert abs(fused.sum() - oracle.sum()) / oracle.sum() < 0.03
    # single-frame mixdown IR is sparse (SmollRoom: no hits before
    # bounce 2, and the reverb fits one 50 ms window): check the first
    # arrival and coarse 50 ms window energies instead of the 5 ms
    # envelope used for the 16-frame accumulations above
    a, o = fused[0, :, 0], oracle[0, :, 0]
    fa = int(np.argmax(a > a.max() * 1e-4))
    fo = int(np.argmax(o > o.max() * 1e-4))
    assert abs(fa - fo) <= 3, (fa, fo)
    ea = a.reshape(4, -1).sum(-1)
    eo = o.reshape(4, -1).sum(-1)
    m = eo > eo.max() * 1e-3
    assert m.sum() >= 1
    assert np.abs(ea[m] - eo[m]).max() / eo.max() < 0.1
