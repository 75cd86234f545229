"""Directive sources and microphones on the fused kernel path.

Round 3: emission/capture weighting by the Fourier power-gain series
(``ops/directivity.py``) runs IN-KERNEL (``_fourier_gain`` — angle-
addition recurrence, no trig), so directive traces — including the
3-virtual-mic spatial capture of ``spatial.py`` — ride the TPU fast path
instead of the jnp oracle. These tests run the whole-frame kernel in
interpret mode; statistical TPU parity lives in
``tests_tpu/test_directive_tpu.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realisticaudioraytracing2d_tpu import spatial as sp
from realisticaudioraytracing2d_tpu.engine import trace_accumulate
from realisticaudioraytracing2d_tpu.models.materials import AudioMaterial
from realisticaudioraytracing2d_tpu.models.rooms import smoll_room
from realisticaudioraytracing2d_tpu.models.scene import SceneBuilder
from realisticaudioraytracing2d_tpu.ops import directivity as dv
from realisticaudioraytracing2d_tpu.ops.ir import IRState, scatter_hits
from realisticaudioraytracing2d_tpu.ops.pallas import bounce_kernel as bk
from realisticaudioraytracing2d_tpu.ops.trace import (TraceParams,
                                                      trace_hits_only)

KW = dict(n_rays=2048, max_bounces=5, sample_rate=8000, ir_length=8000)


@pytest.fixture(scope="module")
def setup():
    room = smoll_room()
    p = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    return room, p, jax.random.PRNGKey(0)


def test_omni_coded_patterns_bit_exact(setup):
    # an explicit omni pattern must take the directive code path yet
    # change nothing: gain = max(0, 1) = 1 per hit, multiplied exactly
    room, p, key = setup
    p1 = p._replace(mic_directivity=jnp.asarray([[1.0]], jnp.float32),
                    directivity=jnp.asarray([1.0], jnp.float32))
    a = np.asarray(bk.trace_frame_ir_whole(room.scene, p, key, **KW))
    b = np.asarray(bk.trace_frame_ir_whole(room.scene, p1, key, **KW))
    assert a.sum() > 0
    np.testing.assert_array_equal(a, b)


def test_cardioid_pair_sums_to_omni(setup):
    # per hit (1 + cos) + (1 - cos) = 2; the two launches round their
    # bf16 one-hot histograms independently, so the identity holds to
    # the hist tolerance, not bitwise
    room, p, key = setup
    a = np.asarray(bk.trace_frame_ir_whole(room.scene, p, key, **KW))
    c0 = np.asarray(bk.trace_frame_ir_whole(
        room.scene, p._replace(mic_directivity=jnp.asarray(dv.cardioid(0.0))),
        key, **KW))
    cp = np.asarray(bk.trace_frame_ir_whole(
        room.scene,
        p._replace(mic_directivity=jnp.asarray(dv.cardioid(np.pi))),
        key, **KW))
    rel = np.linalg.norm(c0 + cp - 2 * a) / np.linalg.norm(2 * a)
    assert rel < 0.01, rel


def test_fused_mic_matches_oracle(setup):
    # same host uniforms -> same ray paths up to <0.5% razor-edge flips
    # (the omni fused-vs-oracle baseline at 2048 rays is ~0.07 rel-norm)
    room, p, key = setup
    pm = p._replace(mic_directivity=jnp.asarray(dv.cardioid(0.7)))
    hits = trace_hits_only(room.scene, pm, key, n_rays=2048, max_bounces=5)
    ir_o = np.asarray(scatter_hits(hits, 8000, 8000))
    ir_k = np.asarray(bk.trace_frame_ir_whole(room.scene, pm, key, **KW))
    assert ir_o.sum() > 0
    assert abs(ir_k.sum() - ir_o.sum()) / ir_o.sum() < 0.02
    assert np.linalg.norm(ir_k - ir_o) / np.linalg.norm(ir_o) < 0.2


def test_fused_source_directivity_matches_oracle(setup):
    room, p, key = setup
    ps = p._replace(directivity=jnp.asarray(dv.figure_eight(0.3)))
    hits = trace_hits_only(room.scene, ps, key, n_rays=2048, max_bounces=5)
    ir_o = np.asarray(scatter_hits(hits, 8000, 8000))
    ir_k = np.asarray(bk.trace_frame_ir_whole(room.scene, ps, key, **KW))
    assert ir_o.sum() > 0
    assert abs(ir_k.sum() - ir_o.sum()) / ir_o.sum() < 0.02
    assert np.linalg.norm(ir_k - ir_o) / np.linalg.norm(ir_o) < 0.2


def echo_scene():
    # reflective wall at x=10; source at origin, listener at (5, 0):
    # direct arrives from -x (bearing pi), the wall echo from +x
    m = AudioMaterial(absorption=0.1, scattering=0.0, transmission=0.0,
                      ior=1.0)
    b = SceneBuilder(n_bands=1)
    b.add_segment((10.0, -20.0), (10.0, 20.0), (-1.0, 0.0), m)
    return b.build()


def test_fused_spatial_bearings():
    # the 3-virtual-mic spatial capture through the fused kernel must
    # localize the direct sound and the echo — a sign/convention error
    # in the in-kernel arrival direction would flip these bearings
    scene = echo_scene()
    p = TraceParams.make(np.float32([0.0, 0.0]), np.float32([5.0, 0.0]),
                         listener_radius=0.5)
    spp = sp.spatial_params(p)
    ir = bk.trace_frame_ir_whole(scene, spp, jax.random.PRNGKey(0),
                                 n_rays=8192, max_bounces=2,
                                 sample_rate=8000, ir_length=2048)
    s = sp.spatial_from_ir(ir)
    ang = np.asarray(s.arrival_angle())[0, :, 0]
    w = np.asarray(s.w)[0, :, 0]
    direct_bin = int(np.floor(5.0 / 343.0 * 8000))
    echo_bin = int(np.floor(15.0 / 343.0 * 8000))
    db = slice(max(0, direct_bin - 3), direct_bin + 4)
    eb = slice(echo_bin - 3, echo_bin + 4)
    assert w[db].sum() > 0 and w[eb].sum() > 0
    assert abs(abs(ang[db][w[db].argmax()]) - np.pi) < 0.1
    assert abs(ang[eb][w[eb].argmax()]) < 0.1


def test_fused_spatial_steer_matches_direct_cardioid():
    # steering the fused spatial IR == tracing the cardioid directly
    # through the fused kernel (identical paths; independent hist
    # rounding per launch)
    scene = echo_scene()
    key = jax.random.PRNGKey(1)
    kw = dict(n_rays=4096, max_bounces=2, sample_rate=8000, ir_length=2048)
    p = TraceParams.make(np.float32([0.0, 0.0]), np.float32([5.0, 0.0]),
                         listener_radius=0.5)
    s = sp.spatial_from_ir(
        bk.trace_frame_ir_whole(scene, sp.spatial_params(p), key, **kw))
    aim = 1.1
    want = np.asarray(bk.trace_frame_ir_whole(
        scene, p._replace(mic_directivity=jnp.asarray(dv.cardioid(aim))),
        key, **kw))
    got = np.asarray(s.steer(aim))
    assert want.sum() > 0
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 0.02


def test_blocked_listeners_slice_per_listener_mics(setup, monkeypatch):
    # force 1-listener blocks: each block must carry ITS listener's
    # pattern row, bit-exactly equal to separate single-listener launches
    room, p, key = setup
    mics = jnp.asarray([dv.cardioid(0.0), dv.cardioid(2.0)])
    p2 = p._replace(
        listeners=jnp.asarray([[0.0, -3.68], [4.0, 0.0]], jnp.float32),
        mic_directivity=mics)
    singles = [
        np.asarray(bk.trace_frame_ir_whole(
            room.scene,
            p2._replace(listeners=p2.listeners[i:i + 1],
                        mic_directivity=mics[i:i + 1]), key, **KW))
        for i in range(2)]
    monkeypatch.setattr(bk, "_LISTENER_CAP", 1)
    blocked = np.asarray(bk.trace_frame_ir_whole(room.scene, p2, key, **KW))
    np.testing.assert_array_equal(blocked,
                                  np.concatenate(singles, axis=0))


def test_rows_kernels_reject_mic(setup):
    room, p, key = setup
    pm = p._replace(mic_directivity=jnp.asarray(dv.cardioid(0.0)))
    with pytest.raises(ValueError, match="whole/mega"):
        bk.trace_fused_rows(room.scene, pm, key, n_rays=256, max_bounces=2)
    with pytest.raises(ValueError, match="whole/mega"):
        bk.trace_frame_ir_fused(room.scene, pm, key, n_rays=256,
                                max_bounces=2, sample_rate=8000,
                                ir_length=4096)


def test_accel_directive_matches_dense_bitwise(setup):
    # the accel one-launch kernel with directive source + mics must be
    # bit-identical to the dense whole-frame kernel on the same
    # Morton-sorted scene (same host uniforms): emission/capture
    # weighting is orthogonal to which wall chunks get computed
    room, p, key = setup
    pm = p._replace(directivity=jnp.asarray(dv.cardioid(0.4)),
                    mic_directivity=jnp.asarray(dv.cardioid(2.5)))
    kw = dict(n_rays=512, max_bounces=4, sample_rate=8000, ir_length=8000)
    acc = np.asarray(bk.trace_frames_ir_accel(
        room.scene, pm, key, n_frames=1, cluster_size=128,
        in_kernel_rng=False, **kw))
    scene_s, _ = bk.cluster_scene_jnp(room.scene, 128)
    dense = np.asarray(bk.trace_frame_ir_whole(scene_s, pm, key, **kw))
    assert acc.sum() > 0
    np.testing.assert_allclose(acc, dense, atol=1e-6)


def test_accel_omni_coded_patterns_bit_exact(setup):
    room, p, key = setup
    kw = dict(n_rays=512, max_bounces=4, sample_rate=8000, ir_length=8000,
              n_frames=1, cluster_size=128, in_kernel_rng=False)
    p1 = p._replace(directivity=jnp.asarray([1.0], jnp.float32),
                    mic_directivity=jnp.asarray([[1.0]], jnp.float32))
    a = np.asarray(bk.trace_frames_ir_accel(room.scene, p, key, **kw))
    b = np.asarray(bk.trace_frames_ir_accel(room.scene, p1, key, **kw))
    assert a.sum() > 0
    np.testing.assert_array_equal(a, b)


def test_accel_sorted_directive_statistical_vs_oracle(setup):
    # the sorted path re-pairs uniforms with rays after each re-sort, so
    # parity with the oracle is statistical (total energy), as for omni
    room, p, key = setup
    pm = p._replace(directivity=jnp.asarray(dv.cardioid(1.2)),
                    mic_directivity=jnp.asarray(dv.cardioid(0.3)))
    acc = np.asarray(bk.trace_frames_ir_accel_sorted(
        room.scene, pm, key, n_rays=4096, max_bounces=5,
        sample_rate=8000, ir_length=8000, n_frames=2, cluster_size=128))
    hits = trace_hits_only(room.scene, pm, jax.random.fold_in(key, 0),
                           n_rays=4096, max_bounces=5)
    o0 = np.asarray(scatter_hits(hits, 8000, 8000))
    hits = trace_hits_only(room.scene, pm, jax.random.fold_in(key, 1),
                           n_rays=4096, max_bounces=5)
    eo = float(o0.sum() + np.asarray(scatter_hits(hits, 8000, 8000)).sum())
    ea = float(acc.sum())
    assert eo > 0
    assert abs(ea - eo) / eo < 0.15


def test_engine_fused_backend_accepts_directive(setup):
    # backend="fused" with directive params runs the interpret
    # whole-frame path off-TPU (it used to raise)
    room, p, key = setup
    pm = p._replace(mic_directivity=jnp.asarray(dv.cardioid(0.5)),
                    directivity=jnp.asarray(dv.cardioid(2.0)))
    st = trace_accumulate(room.scene, pm, IRState.zeros(8000), key,
                          n_rays=1024, max_bounces=5, sample_rate=8000,
                          backend="fused")
    assert float(st.sum.sum()) > 0
    ref = bk.trace_frame_ir_whole(room.scene, pm,
                                  jax.random.fold_in(key, 0),
                                  n_rays=1024, max_bounces=5,
                                  sample_rate=8000, ir_length=8000)
    np.testing.assert_array_equal(np.asarray(st.sum), np.asarray(ref))


def test_fused_rows_source_directivity_weights_emission(setup):
    # the per-bounce rows kernels get directive SOURCES via host-side
    # emission weighting in _fused_setup — exact vs the oracle hits
    room, p, key = setup
    ps = p._replace(directivity=jnp.asarray(dv.cardioid(1.0)))
    rows = bk.trace_fused_rows(room.scene, ps, key, n_rays=1024,
                               max_bounces=3)
    ir_rows = np.asarray(bk.scatter_hits_rows(rows, 8000, 8000))
    hits = trace_hits_only(room.scene, ps, key, n_rays=1024, max_bounces=3)
    ir_o = np.asarray(scatter_hits(hits, 8000, 8000))
    assert ir_o.sum() > 0
    assert np.linalg.norm(ir_rows - ir_o) / np.linalg.norm(ir_o) < 0.2


# ---- rooms-batched kernel: per-entry patterns (round 3) --------------------


def test_rooms_mega_per_source_aims_match_singles(setup):
    # the interpret fallback scans whole-frame launches with
    # fold_in(key, i) / fold_in(k, f) keys: entry i with ITS aim must be
    # bit-identical to a standalone whole-frame trace of that entry
    room, p, key = setup
    srcs = jnp.asarray([[0.0, -3.0], [1.0, -3.0]], jnp.float32)
    aims = jnp.asarray([dv.cardioid(0.0), dv.cardioid(2.0)], jnp.float32)
    mic = jnp.asarray(dv.cardioid(1.0), jnp.float32)
    kw = dict(n_rays=512, max_bounces=4, sample_rate=8000, ir_length=8000)
    shared = jax.tree_util.tree_map(lambda x: x[None], room.scene)
    lis = jnp.broadcast_to(jnp.atleast_2d(room.listener)[None],
                           (2, 1, 2)).astype(jnp.float32)
    batch = np.asarray(bk.trace_rooms_ir_mega(
        shared, srcs, lis, key, n_frames=1, directivity=aims,
        mic_directivity=mic, **kw))
    for i in range(2):
        p_i = TraceParams.make(srcs[i], room.listener,
                               directivity=aims[i], mic_directivity=mic)
        single = np.asarray(bk.trace_frame_ir_whole(
            room.scene, p_i,
            jax.random.fold_in(jax.random.fold_in(key, i), 0), **kw))
        assert single.sum() > 0
        np.testing.assert_array_equal(batch[i], single)


def test_mixdown_per_source_aims_matches_manual_sum(setup):
    # jnp-path mixdown with [S, C] aims == the sum of per-source oracle
    # scatters traced with the same split keys (exact construction)
    from realisticaudioraytracing2d_tpu.parallel.multisource import (
        trace_sources_mixdown)
    room, p, key = setup
    srcs = jnp.asarray([[0.0, -3.0], [1.0, -3.0]], jnp.float32)
    # pad the 3-coeff cardioid with zero 2nd-harmonic rows to stack it
    # with the 5-coeff figure-eight (zero coefficients are exact)
    aims = jnp.stack([jnp.pad(jnp.asarray(dv.cardioid(0.0)), (0, 2)),
                      jnp.asarray(dv.figure_eight(1.0))]).astype(
                          jnp.float32)
    pm = p._replace(source=srcs, directivity=aims)
    kw = dict(n_rays=512, max_bounces=4, sample_rate=8000, ir_length=8000)
    mix = np.asarray(trace_sources_mixdown(room.scene, pm, key,
                                           backend="jnp", **kw))
    keys = jax.random.split(key, 2)
    want = 0
    for i in range(2):
        p_i = p._replace(source=srcs[i], directivity=aims[i])
        hits = trace_hits_only(room.scene, p_i, keys[i], n_rays=512,
                               max_bounces=4)
        want = want + np.asarray(scatter_hits(hits, 8000, 8000))
    assert want.sum() > 0
    np.testing.assert_allclose(mix, want, atol=1e-6)


def test_sweep_directive_sharded_matches_unsharded(setup):
    # directive patterns ride the sharded sweep untouched (jnp path is
    # bit-deterministic by global room id)
    from realisticaudioraytracing2d_tpu.parallel.sweep import (
        sweep_rooms, sweep_rooms_sharded)
    from jax.sharding import Mesh
    room, p, key = setup
    n_rooms = 4
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_rooms,) + x.shape),
        room.scene)
    srcs = jnp.broadcast_to(jnp.asarray(room.source)[None], (n_rooms, 2))
    lis = jnp.broadcast_to(jnp.asarray(room.listener)[None], (n_rooms, 2))
    kw = dict(n_rays=256, max_bounces=4, sample_rate=8000, ir_length=8000,
              directivity=jnp.asarray(dv.cardioid(0.5)),
              mic_directivity=jnp.asarray(dv.cardioid(2.0)))
    a = np.asarray(sweep_rooms(scenes, srcs, lis, key, backend="jnp",
                               **kw))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("rooms",))
    b = np.asarray(sweep_rooms_sharded(scenes, srcs, lis, key, mesh,
                                       backend="jnp", **kw))
    assert a.sum() > 0
    np.testing.assert_array_equal(a, b)
