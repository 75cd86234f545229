"""Fused bounce-kernel tests (interpret mode): full parity with the jnp
trace and accuracy of the in-kernel MXU histogram."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.engine import trace_accumulate
from realisticaudioraytracing2d_tpu.models.rooms import smoll_room
from realisticaudioraytracing2d_tpu.ops.ir import IRState
from realisticaudioraytracing2d_tpu.ops.pallas import bounce_kernel as bk
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams, trace

R, B = 1024, 5


@pytest.fixture(scope="module")
def setup():
    room = smoll_room()
    p = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    return room, p, jax.random.PRNGKey(3)


def test_trace_fused_full_parity(setup):
    # The fused kernel reorders float math (refined reciprocal, rsqrt,
    # fused arithmetic), so razor-edge hits may flip and per-bounce
    # rounding cascades: parity is statistical, not bitwise.
    room, p, key = setup
    hj, _ = trace(room.scene, p, key, n_rays=R, max_bounces=B)
    hf = bk.trace_fused(room.scene, p, key, n_rays=R, max_bounces=B,
                        tile_r=256)
    vj, vf = np.asarray(hj.valid), np.asarray(hf.valid)
    assert vj.sum() > 500
    assert (vj != vf).mean() < 5e-3          # <0.5% edge flips
    m = vj & vf
    np.testing.assert_allclose(np.asarray(hf.delay)[m],
                               np.asarray(hj.delay)[m], rtol=1e-4,
                               atol=1e-5)
    ej = np.asarray(hj.energy)[..., 0][m]
    ef = np.asarray(hf.energy)[..., 0][m]
    np.testing.assert_allclose(ef, ej, rtol=1e-2, atol=1e-9)
    # totals agree tightly
    tj = float((np.asarray(hj.energy)[..., 0] * vj).sum())
    tf = float((np.asarray(hf.energy)[..., 0] * vf).sum())
    # a handful of edge-flipped hits can carry ~1% of total energy; the
    # per-frame Monte-Carlo noise itself is ~5%
    assert abs(tj - tf) / tj < 3e-2


def test_hist_matches_exact_scatter(setup):
    room, p, key = setup
    T = 12000
    kw = dict(n_rays=R, max_bounces=B, sample_rate=8000, n_frames=2)
    hist = bk.trace_accumulate_fused(room.scene, p, IRState.zeros(T, 1, 1),
                                     key, **kw)
    exact = bk.trace_accumulate_fused(room.scene, p, IRState.zeros(T, 1, 1),
                                      key, exact_scatter=True, **kw)
    a, b = np.asarray(hist.sum), np.asarray(exact.sum)
    nz = b != 0
    assert nz.sum() > 300
    np.testing.assert_array_equal(a != 0, nz)  # identical bin support
    # bf16 one-hot energies: <=0.5% per-bin error
    rel = np.abs(a[nz] - b[nz]) / np.abs(b[nz])
    assert rel.max() < 6e-3
    assert int(hist.frames) == 2


def test_fused_rows_and_scatter_consistency(setup):
    # scatter_hits_rows on trace_fused_rows == ir.scatter_hits on the
    # equivalent Hits pytree.
    from realisticaudioraytracing2d_tpu.ops.ir import scatter_hits
    room, p, key = setup
    T = 8000
    rows = bk.trace_fused_rows(room.scene, p, key, n_rays=R, max_bounces=B,
                               tile_r=256)
    ir_rows = np.asarray(bk.scatter_hits_rows(rows, 8000, T))
    hits = bk.trace_fused(room.scene, p, key, n_rays=R, max_bounces=B,
                          tile_r=256)
    ir_hits = np.asarray(scatter_hits(hits, 8000, T))
    np.testing.assert_allclose(ir_rows, ir_hits, rtol=1e-6, atol=1e-8)


def test_engine_backend_routing(setup):
    # backend="fused" must agree with backend="jnp" on CPU (interpret) up
    # to the histogram's bf16 rounding.
    room, p, key = setup
    T = 8000
    st_j = trace_accumulate(room.scene, p, IRState.zeros(T, 1, 1), key,
                            n_rays=R, max_bounces=B, sample_rate=8000,
                            n_frames=1, backend="jnp")
    st_f = trace_accumulate(room.scene, p, IRState.zeros(T, 1, 1), key,
                            n_rays=R, max_bounces=B, sample_rate=8000,
                            n_frames=1, backend="fused")
    a, b = np.asarray(st_f.sum).ravel(), np.asarray(st_j.sum).ravel()
    # support may differ by a few razor-edge bins; energy must agree
    assert (np.abs((a != 0).mean() - (b != 0).mean()) < 5e-3)
    assert abs(a.sum() - b.sum()) / b.sum() < 1e-2
    # bin-level L2 agreement
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 0.05


def test_fused_rejects_unsupported_configs(setup):
    room, p, key = setup
    ears = jnp.asarray([[0.0, -3.68], [0.5, -3.68]])
    p2 = TraceParams.make(room.source, ears, 0.5, 343.0, 1.0)
    with pytest.raises(ValueError):
        bk.trace_fused(room.scene, p2, key, n_rays=64, max_bounces=2)


def test_fused_non_multiple_ray_count(setup):
    # ray counts that don't divide the tile must pad with dead rays
    room, p, key = setup
    hf = bk.trace_fused(room.scene, p, key, n_rays=300, max_bounces=3,
                        tile_r=256)
    assert hf.valid.shape == (3, 2, 300, 1)
    hj, _ = trace(room.scene, p, key, n_rays=300, max_bounces=3)
    assert (np.asarray(hf.valid) != np.asarray(hj.valid)).mean() < 5e-3


def test_fused_hist_bitwise_deterministic(setup):
    room, p, key = setup
    kw = dict(n_rays=R, max_bounces=B, sample_rate=8000, n_frames=1)
    a = bk.trace_accumulate_fused(room.scene, p, IRState.zeros(4000, 1, 1),
                                  key, **kw)
    b = bk.trace_accumulate_fused(room.scene, p, IRState.zeros(4000, 1, 1),
                                  key, **kw)
    np.testing.assert_array_equal(np.asarray(a.sum), np.asarray(b.sum))


def test_auto_tile_bounds():
    assert bk.auto_tile(8) == bk.DEF_TILE_R
    assert bk.auto_tile(1032) in (256, 384, 512, 640)
    # tile * wp * 16B stays within the ~10MB working budget
    for w in (8, 100, 1032, 4000):
        assert bk.auto_tile(w) * ((w + 7) // 8 * 8) * 16 <= 10 * 2 ** 20
    with pytest.raises(ValueError):
        bk.auto_tile(100000)  # beyond one-tile VMEM: needs ACCEL.md plan


def test_accel_sizing_bounds():
    # SMEM ceiling: auto-grown cluster size keeps the per-cluster AABB
    # table under the measured v5e scalar-memory bound (docs/ACCEL.md
    # round 4: C=1954 crashes Mosaic, C<=1536 compiles).
    for walls in (8, 1032, 100_008, 400_008, 800_008, 1_000_008, 4_000_008):
        cs = bk.accel_cluster_size(walls)
        n_clusters = -(-max(walls, cs) // cs)
        assert n_clusters <= bk._ACCEL_MAX_CLUSTERS
    assert bk.accel_cluster_size(1_000_008) == 1024

    # Scoped-VMEM override: None (default bound, stable cache keys) for
    # small wall tables; raised but physically capped for huge ones.
    assert bk._accel_compiler_params(8, 6) is None
    assert bk._accel_compiler_params(100_008, 6) is None
    big = bk._accel_compiler_params(1_000_008, 6)
    assert big is not None
    lim = big.vmem_limit_bytes
    assert 1_000_008 * 4 * (8 + 6) < lim <= 128 * 2 ** 20


def test_stereo_fused_hist(setup):
    room, p, key = setup
    ears = np.stack([np.asarray([0.0, -3.68]),
                     np.asarray([0.5, -3.68])]).astype(np.float32)
    p2 = TraceParams.make(p.source, ears, 0.5, 343.0, 1.0)
    T = 8000
    stj = trace_accumulate(room.scene, p2, IRState.zeros(T, 2, 1), key,
                           n_rays=R, max_bounces=B, sample_rate=8000,
                           n_frames=1, backend="jnp")
    stf = trace_accumulate(room.scene, p2, IRState.zeros(T, 2, 1), key,
                           n_rays=R, max_bounces=B, sample_rate=8000,
                           n_frames=1, backend="fused")
    a, b = np.asarray(stf.sum), np.asarray(stj.sum)
    assert a.shape == (2, T, 1)
    for ear in range(2):
        al, bl = a[ear].ravel(), b[ear].ravel()
        assert abs(al.sum() - bl.sum()) / bl.sum() < 2e-2
        assert np.linalg.norm(al - bl) / np.linalg.norm(bl) < 0.1
    assert not np.allclose(a[0], a[1])  # ears hear different IRs


def test_quad_listener_fused_hist(setup):
    # Round 2: the fused kernels cover up to 4 listeners (scal row 2
    # carries listeners 3/4). Per-listener parity with the jnp oracle.
    room, p, key = setup
    ears = np.asarray([[0.0, -3.68], [0.5, -3.68],
                       [-6.0, 2.0], [8.0, -1.0]], np.float32)
    p4 = TraceParams.make(p.source, ears, 0.5, 343.0, 1.0)
    T = 8000
    stj = trace_accumulate(room.scene, p4, IRState.zeros(T, 4, 1), key,
                           n_rays=R, max_bounces=B, sample_rate=8000,
                           n_frames=1, backend="jnp")
    stf = trace_accumulate(room.scene, p4, IRState.zeros(T, 4, 1), key,
                           n_rays=R, max_bounces=B, sample_rate=8000,
                           n_frames=1, backend="fused")
    a, b = np.asarray(stf.sum), np.asarray(stj.sum)
    assert a.shape == (4, T, 1)
    for ear in range(4):
        al, bl = a[ear].ravel(), b[ear].ravel()
        assert bl.sum() > 0, ear
        assert abs(al.sum() - bl.sum()) / bl.sum() < 2e-2, ear
        assert np.linalg.norm(al - bl) / np.linalg.norm(bl) < 0.1, ear
    # distinct positions hear distinct IRs
    for ear in range(1, 4):
        assert not np.allclose(a[0], a[ear])
    # 5 listeners exceed one launch's 4 scal slots: the wrapper now
    # splits into blocked launches (4+1) whose first 4 rows must equal
    # the single-launch quad result exactly (same key -> same rays)
    ears5 = np.pad(ears, [(0, 1), (0, 0)])
    p5 = TraceParams.make(p.source, ears5, 0.5, 343.0, 1.0)
    st5 = trace_accumulate(room.scene, p5, IRState.zeros(T, 5, 1), key,
                           n_rays=R, max_bounces=B, sample_rate=8000,
                           n_frames=1, backend="fused")
    a5 = np.asarray(st5.sum)
    assert a5.shape == (5, T, 1)
    np.testing.assert_array_equal(a5[:4], a)


def test_whole_frame_kernel_bitwise_matches_per_bounce(setup):
    room, p, key = setup
    kw = dict(n_rays=R, max_bounces=B, sample_rate=8000, ir_length=8000)
    a = np.asarray(bk.trace_frame_ir_whole(room.scene, p, key, **kw))
    b = np.asarray(bk.trace_frame_ir_fused(room.scene, p, key, **kw))
    np.testing.assert_array_equal(a, b)
    assert a.sum() > 0


def test_whole_frame_kernel_stereo(setup):
    room, p, key = setup
    ears = np.stack([np.asarray([0.0, -3.68]),
                     np.asarray([0.5, -3.68])]).astype(np.float32)
    p2 = TraceParams.make(p.source, ears, 0.5, 343.0, 1.0)
    kw = dict(n_rays=R, max_bounces=B, sample_rate=8000, ir_length=8000)
    a = np.asarray(bk.trace_frame_ir_whole(room.scene, p2, key, **kw))
    b = np.asarray(bk.trace_frame_ir_fused(room.scene, p2, key, **kw))
    assert a.shape == (2, 8000, 1)
    np.testing.assert_array_equal(a, b)


def test_banded_fused_matches_jnp():
    # Per-band parity of the banded whole-frame kernel with the jnp oracle
    room = smoll_room(n_bands=4)
    p = TraceParams.make(room.source, np.asarray([0.0, -3.68]), 0.5,
                         343.0, 1.0)
    key = jax.random.PRNGKey(3)
    T = 8000
    kw = dict(n_rays=R, max_bounces=B, sample_rate=8000, n_frames=1)
    stj = trace_accumulate(room.scene, p, IRState.zeros(T, 1, 4), key,
                           backend="jnp", **kw)
    stf = trace_accumulate(room.scene, p, IRState.zeros(T, 1, 4), key,
                           backend="fused", **kw)
    a, b = np.asarray(stf.sum), np.asarray(stj.sum)
    assert a.shape == (1, T, 4)
    for k in range(4):
        band_f, band_j = a[0, :, k], b[0, :, k]
        assert band_j.sum() > 0
        assert abs(band_f.sum() - band_j.sum()) / band_j.sum() < 1e-2
        assert np.linalg.norm(band_f - band_j) / \
            np.linalg.norm(band_j) < 0.05
    # banded materials absorb more in high bands -> monotone band sums
    sums = a[0].sum(axis=0)
    assert np.all(np.diff(sums) < 0)


def test_banded_stereo_fused():
    room = smoll_room(n_bands=3)
    ears = np.stack([[0.0, -3.68], [0.5, -3.68]]).astype(np.float32)
    p = TraceParams.make(room.source, ears, 0.5, 343.0, 1.0)
    st = trace_accumulate(room.scene, p, IRState.zeros(4000, 2, 3),
                          jax.random.PRNGKey(0), n_rays=512, max_bounces=4,
                          sample_rate=8000, n_frames=1, backend="fused")
    a = np.asarray(st.sum)
    assert a.shape == (2, 4000, 3)
    assert a.sum() > 0
    assert not np.allclose(a[0], a[1])


def test_mega_kernel_tpu_only(setup):
    # off-TPU the mega kernel refuses (no interpret-mode PRNG) and
    # trace_accumulate_fused transparently falls back to the scan path
    room, p, key = setup
    with pytest.raises(NotImplementedError):
        bk.trace_frames_ir_mega(room.scene, p, key, n_rays=256,
                                max_bounces=2, sample_rate=8000,
                                ir_length=4000, n_frames=1)
    st = bk.trace_accumulate_fused(room.scene, p, IRState.zeros(4000, 1, 1),
                                   key, n_rays=256, max_bounces=4,
                                   sample_rate=8000, n_frames=2)
    assert int(st.frames) == 2 and float(st.sum.sum()) > 0


# ---------------------------------------------------------------------------
# Large-scene acceleration (cluster early-out + Morton re-sort), interpret
# ---------------------------------------------------------------------------

def _city():
    from realisticaudioraytracing2d_tpu.models.rooms import city_scene
    return city_scene(n_boxes=40, seed=1, extent=60.0)


def test_accel_sorted_early_out_is_lossless():
    # The AABB early-out may only SKIP computation, never change results:
    # with identical uniforms and re-sorts, early_out on/off must be
    # bit-identical (covers the slab test's conservativeness).
    from realisticaudioraytracing2d_tpu.ops.pallas.bounce_kernel import (
        trace_frames_ir_accel_sorted)
    room = _city()
    params = TraceParams.make(room.source, room.listener,
                              room.listener_radius, 343.0, 10.0)
    kw = dict(n_rays=512, max_bounces=3, sample_rate=8000, ir_length=2048,
              n_frames=1, cluster_size=128)
    key = jax.random.PRNGKey(4)
    a = np.asarray(trace_frames_ir_accel_sorted(
        room.scene, params, key, early_out=True, **kw))
    b = np.asarray(trace_frames_ir_accel_sorted(
        room.scene, params, key, early_out=False, **kw))
    assert a.sum() > 0
    np.testing.assert_array_equal(a, b)


def test_accel_hierarchy_matches_flat(monkeypatch):
    # Round 3 (VERDICT r2 weak #2): the two-level super-cluster sweep
    # must be bit-identical to the flat single-level sweep on BOTH accel
    # kernels — the super AABB test (like the child test) only SKIPS
    # computation. Small cluster_size forces enough clusters (~80) for a
    # real hierarchy (group 8) on a CPU-sized scene.
    from realisticaudioraytracing2d_tpu.models.rooms import city_scene
    room = city_scene(n_boxes=150, seed=2, extent=100.0)
    params = TraceParams.make(room.source, room.listener,
                              room.listener_radius, 343.0, 10.0)
    kw = dict(n_rays=256, max_bounces=3, sample_rate=8000, ir_length=2048,
              n_frames=1, cluster_size=8)
    key = jax.random.PRNGKey(11)
    n_clusters = -(-room.scene.n_walls // 8)
    assert bk.accel_group(n_clusters) > 1       # hierarchy actually on
    a_sorted = np.asarray(bk.trace_frames_ir_accel_sorted(
        room.scene, params, key, **kw))
    a_whole = np.asarray(bk.trace_frames_ir_accel(
        room.scene, params, key, in_kernel_rng=False, **kw))
    monkeypatch.setattr(bk, "accel_group", lambda c: 1)
    b_sorted = np.asarray(bk.trace_frames_ir_accel_sorted.__wrapped__(
        room.scene, params, key, **kw))
    b_whole = np.asarray(bk.trace_frames_ir_accel.__wrapped__(
        room.scene, params, key, in_kernel_rng=False, **kw))
    assert a_sorted.sum() > 0 and a_whole.sum() > 0
    np.testing.assert_array_equal(a_sorted, b_sorted)
    np.testing.assert_array_equal(a_whole, b_whole)


def test_accel_sorted_time_windowed_matches_unwindowed(monkeypatch):
    # ADVICE r2: K=1 configs whose single-listener histogram overflows
    # VMEM previously raised ValueError in the sorted accel path (no
    # _blocked_time); they now run as IR time windows, bit-exact vs one
    # unwindowed launch (host-threefry uniforms, same key -> same rays).
    room = _city()
    params = TraceParams.make(room.source, room.listener,
                              room.listener_radius, 343.0, 10.0)
    kw = dict(n_rays=256, max_bounces=3, sample_rate=8000, ir_length=4096,
              n_frames=1, cluster_size=128)
    key = jax.random.PRNGKey(9)
    a = np.asarray(bk.trace_frames_ir_accel_sorted(
        room.scene, params, key, **kw))
    orig_lb = bk.listener_block
    monkeypatch.setattr(bk, "listener_block",
                        lambda k, T: 0 if T > 2048 else orig_lb(k, T))
    monkeypatch.setattr(bk, "time_window", lambda k: 2048)
    b = np.asarray(bk.trace_frames_ir_accel_sorted.__wrapped__(
        room.scene, params, key, **kw))
    assert a.sum() > 0
    np.testing.assert_array_equal(a, b)


def test_accel_whole_frame_matches_dense_kernel_bitwise():
    # Chunked wall sweeps on the Morton-sorted scene == the dense kernel
    # on the same sorted scene (same host uniforms): bit parity.
    from realisticaudioraytracing2d_tpu.ops.pallas.bounce_kernel import (
        cluster_scene_jnp, trace_frame_ir_whole, trace_frames_ir_accel)
    room = _city()
    params = TraceParams.make(room.source, room.listener,
                              room.listener_radius, 343.0, 10.0)
    key = jax.random.PRNGKey(2)
    kw = dict(n_rays=512, max_bounces=3, sample_rate=8000, ir_length=2048)
    acc = trace_frames_ir_accel(room.scene, params, key, n_frames=1,
                                cluster_size=128, in_kernel_rng=False,
                                **kw)
    scene_s, _ = cluster_scene_jnp(room.scene, 128)
    dense = trace_frame_ir_whole(scene_s, params, key, **kw)
    a, d = np.asarray(acc), np.asarray(dense)
    assert a.sum() > 0
    np.testing.assert_allclose(a, d, atol=1e-6)


def test_accel_sorted_statistical_parity_with_oracle():
    # Different uniform->ray pairing after re-sorts => statistical parity
    # with the jnp oracle: total IR energy within Monte-Carlo noise.
    from realisticaudioraytracing2d_tpu.ops import ir as irm
    from realisticaudioraytracing2d_tpu.ops.pallas.bounce_kernel import (
        trace_frames_ir_accel_sorted)
    from realisticaudioraytracing2d_tpu.engine import trace_accumulate
    room = _city()
    params = TraceParams.make(room.source, room.listener,
                              room.listener_radius, 343.0, 10.0)
    kw = dict(n_rays=4096, max_bounces=4, sample_rate=8000)
    key = jax.random.PRNGKey(7)
    acc = np.asarray(trace_frames_ir_accel_sorted(
        room.scene, params, key, ir_length=2048, n_frames=2,
        cluster_size=128, **kw))
    oracle = trace_accumulate(room.scene, params,
                              irm.IRState.zeros(2048, 1, 1), key,
                              n_frames=2, backend="jnp", **kw)
    eo = float(np.asarray(oracle.sum).sum())
    ea = float(acc.sum())
    assert eo > 0
    assert abs(ea - eo) / eo < 0.15


def test_cluster_scene_jnp_matches_native_builder():
    # The in-jit clustering and the host C++ builder produce the same
    # wall order and AABBs (same Morton key construction).
    from realisticaudioraytracing2d_tpu import native
    from realisticaudioraytracing2d_tpu.ops.pallas.bounce_kernel import (
        cluster_scene_jnp)
    room = _city()
    scene = room.scene.pad_to(
        ((room.scene.n_walls + 127) // 128) * 128)
    segs = np.concatenate([np.asarray(scene.a), np.asarray(scene.b),
                           np.asarray(scene.normal)], -1)
    order, aabb = native.morton_clusters(segs, 128)
    scene_s, aabb_j = cluster_scene_jnp(room.scene, 128)
    np.testing.assert_allclose(np.asarray(scene_s.a),
                               np.asarray(scene.a)[order], atol=0)
    valid = aabb[:, 0] <= aabb[:, 2]
    np.testing.assert_allclose(np.asarray(aabb_j)[valid], aabb[valid],
                               rtol=1e-6)


def test_listener_blocking_bit_exact_vs_per_listener():
    # L=6 > the 4 scal slots: the wrapper splits listeners into blocks
    # and relaunches with the SAME key. Ray physics never reads the
    # listener table, so the result must be bit-identical to running
    # each listener alone (and to any other block partition).
    room = smoll_room()
    key = jax.random.PRNGKey(3)
    lis = jnp.asarray([[1.0 + 0.3 * i, 0.5 - 0.2 * i] for i in range(6)],
                      jnp.float32)
    p6 = TraceParams.make(room.source, lis, 0.5, 343.0, 1.0)
    kw = dict(n_rays=512, max_bounces=B, sample_rate=8000, ir_length=2048)
    ir = np.asarray(bk.trace_frame_ir_whole(room.scene, p6, key, **kw))
    assert ir.shape == (6, 2048, 1)
    per = np.concatenate([
        np.asarray(bk.trace_frame_ir_whole(
            room.scene,
            TraceParams.make(room.source, lis[i:i + 1], 0.5, 343.0, 1.0),
            key, **kw))
        for i in range(6)], axis=0)
    np.testing.assert_array_equal(ir, per)
    # every listener actually heard something distinct
    assert (ir.sum(axis=(1, 2)) > 0).all()
    assert not np.allclose(ir[0], ir[5])


def test_listener_block_budget():
    # 16-cap at small configs (round 3: listener TABLE replaced the
    # 4-slot scal packing); shrinks as K*T grows; 0 when one listener
    # cannot fit (config must window the IR or take the jnp path)
    assert bk.listener_block(1, 2048) == 16
    assert bk.listener_block(1, 72000) == 16   # 305 KB/listener, 16 fit
    assert bk.listener_block(16, 72000) == 1   # the old "<=16 bands" edge
    assert bk.listener_block(32, 72000) == 0   # over budget even alone
    assert bk.listener_block(32, 24000) >= 1


def test_many_listener_single_launch_bit_exact():
    # Round 3 (VERDICT r2 weak #3): up to 16 listeners share ONE
    # launch's ray physics (coords from the [2, Lp] VMEM table, not the
    # old 4 scal slots). Each listener row must equal the corresponding
    # single-listener run bit-for-bit — physics never reads the table.
    room = smoll_room()
    ears = np.stack([[0.0 + 0.3 * i, -3.68 + 0.1 * i]
                     for i in range(8)]).astype(np.float32)
    p8 = TraceParams.make(room.source, ears, 0.5, 343.0, 1.0)
    key = jax.random.PRNGKey(2)
    kw = dict(n_rays=512, max_bounces=4, sample_rate=8000, ir_length=2048)
    assert bk.listener_block(1, 2048) >= 8     # really one launch
    ir8 = np.asarray(bk.trace_frame_ir_whole(room.scene, p8, key, **kw))
    assert ir8.shape == (8, 2048, 1)
    for i in (0, 3, 7):
        p1 = TraceParams.make(room.source, ears[i:i + 1], 0.5, 343.0, 1.0)
        ir1 = np.asarray(bk.trace_frame_ir_whole(room.scene, p1, key,
                                                 **kw))
        np.testing.assert_array_equal(ir8[i:i + 1], ir1)
    assert (ir8.sum(axis=(1, 2)) > 0).all()


def test_wide_band_kernel_matches_jnp_oracle():
    # K=24 (past the old 16-band cap): whole-frame kernel vs jnp oracle,
    # statistical parity (bf16 histogram rounding ~0.5%)
    room = smoll_room(n_bands=24)
    key = jax.random.PRNGKey(3)
    p = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    kw = dict(n_rays=512, max_bounces=B, sample_rate=8000, ir_length=2048)
    ir = np.asarray(bk.trace_frame_ir_whole(room.scene, p, key, **kw))
    from realisticaudioraytracing2d_tpu.ops import ir as irm
    hits, _ = trace(room.scene, p, key, n_rays=512, max_bounces=B)
    oracle = np.asarray(irm.scatter_hits(hits, 8000, 2048))
    assert ir.shape == oracle.shape == (1, 2048, 24)
    assert oracle.sum() > 0
    assert abs(ir.sum() - oracle.sum()) / oracle.sum() < 1e-2
    assert np.abs(ir - oracle).sum() / oracle.sum() < 2e-2


def test_engine_routes_many_listeners_fused(monkeypatch):
    # L=8/K=1 now routes to the fused path on TPU (blocked launches)
    # instead of the jnp fallback; L=1/K=32 at 72k bins is fused too —
    # via IR time-axis windows (round 2); only absurd band counts that
    # can't fit even one 8-row window block fall back.
    from realisticaudioraytracing2d_tpu import engine
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    room = smoll_room()
    lis8 = jnp.zeros((8, 2), jnp.float32)
    p8 = TraceParams.make(room.source, lis8, 0.5, 343.0, 1.0)
    assert engine._fused_eligible(room.scene, p8, 72000)
    room32 = smoll_room(n_bands=32)
    p1 = TraceParams.make(room32.source, room32.listener, 0.5, 343.0, 1.0)
    assert engine._fused_eligible(room32.scene, p1, 72000)
    assert engine._fused_eligible(room32.scene, p1, 24000)
    assert bk.time_window(512) == 0  # genuinely impossible band count


def test_time_windowed_hist_partition_invariant():
    # Over-VMEM histograms run as IR time windows (traced bin offset,
    # one shared compile). The decomposition must be EXACT: any window
    # partition gives bit-identical results (same key -> same rays; each
    # hit lands in exactly one window).
    room = smoll_room(n_bands=32)
    p = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    key = jax.random.PRNGKey(4)
    T = 48128
    assert bk.listener_block(32, T) == 0        # forces the windowed path
    kw = dict(n_rays=256, max_bounces=4, sample_rate=48000, ir_length=T)
    a = np.asarray(bk.trace_frame_ir_whole(room.scene, p, key, **kw))
    assert a.shape == (1, T, 32)
    orig = bk.time_window
    bk.time_window = lambda n_bands: 16384      # different boundaries
    try:
        b = np.asarray(bk.trace_frame_ir_whole.__wrapped__(
            room.scene, p, key, **kw))
    finally:
        bk.time_window = orig
    np.testing.assert_array_equal(a, b)
    # and the windowed result matches the jnp oracle statistically
    from realisticaudioraytracing2d_tpu.ops import ir as irm
    hits, _ = trace(room.scene, p, key, n_rays=256, max_bounces=4)
    oracle = np.asarray(irm.scatter_hits(hits, 48000, T))
    assert oracle.sum() > 0
    assert abs(a.sum() - oracle.sum()) / oracle.sum() < 1e-2


def test_exact_scatter_multi_listener(setup):
    # The f32 exact-scatter path now covers multi-listener via one rows
    # pass per listener (same key -> identical ray paths). Each row must
    # equal the corresponding single-listener run bit-for-bit.
    room, p, key = setup
    ears = np.stack([[0.0, -3.68], [0.8, -3.2], [1.5, -2.0]]).astype(
        np.float32)
    p3 = TraceParams.make(p.source, ears, 0.5, 343.0, 1.0)
    T = 4000
    kw = dict(n_rays=512, max_bounces=4, sample_rate=8000, n_frames=1)
    st = bk.trace_accumulate_fused(room.scene, p3, IRState.zeros(T, 3, 1),
                                   key, exact_scatter=True, **kw)
    a = np.asarray(st.sum)
    assert a.shape == (3, T, 1)
    for i in range(3):
        p1 = TraceParams.make(p.source, ears[i:i + 1], 0.5, 343.0, 1.0)
        s1 = bk.trace_accumulate_fused(room.scene, p1,
                                       IRState.zeros(T, 1, 1), key,
                                       exact_scatter=True, **kw)
        np.testing.assert_array_equal(a[i:i + 1], np.asarray(s1.sum))
    assert a.sum() > 0


def test_rooms_eligibility_includes_windowed_configs(monkeypatch):
    # Round 3 (VERDICT r2 weak #4): the ROOMS kernel gained the IR
    # time-window decomposition, so banded/long-IR sweeps and mixdowns
    # stay fused — eligibility now mirrors the single-scene wrappers
    # (only absurd band counts fall back to jnp).
    from realisticaudioraytracing2d_tpu import engine
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    room32 = smoll_room(n_bands=32)
    p = TraceParams.make(room32.source, room32.listener, 0.5, 343.0, 1.0)
    assert engine._fused_eligible(room32.scene, p, 72000)       # windowed
    assert engine._rooms_fused_eligible(room32.scene, p, 72000)  # windowed
    assert engine._rooms_fused_eligible(room32.scene, p, 24000)
    room512 = smoll_room(n_bands=512)
    p512 = TraceParams.make(room512.source, room512.listener, 0.5, 343.0,
                            1.0)
    assert not engine._rooms_fused_eligible(room512.scene, p512, 512)


def test_rooms_mega_time_window_decomposition(monkeypatch):
    # The rooms kernel's over-VMEM branch must recurse into equal
    # LO-aligned windows whose (offset, length) pairs exactly partition
    # the requested IR, each window keeping the caller's base offset.
    from realisticaudioraytracing2d_tpu.models.rooms import random_rooms
    scenes, sources, listeners = random_rooms(2, seed=0, n_obstacles=1,
                                              n_bands=32)
    T = 72000
    assert bk.listener_block(32, T) == 0        # forces the windowed path
    calls = []

    def fake_rooms_mega(scenes_, sources_, listeners_, key_, **kw):
        calls.append((int(np.asarray(kw["bin_offset"])), kw["ir_length"]))
        return jnp.zeros((sources_.shape[0], 1, kw["ir_length"], 32),
                         jnp.float32)

    real_unjitted = bk.trace_rooms_ir_mega.__wrapped__
    monkeypatch.setattr(bk, "trace_rooms_ir_mega", fake_rooms_mega)
    out = real_unjitted(
        scenes, sources, listeners, jax.random.PRNGKey(0), n_rays=128,
        max_bounces=2, sample_rate=48000, ir_length=T, n_frames=1,
        bin_offset=512)
    assert out.shape == (2, 1, T, 32)
    # windows tile [512, 512+T) contiguously, all equal LO-aligned length
    assert len(calls) >= 2
    assert calls[0][0] == 512
    tw = calls[0][1]
    assert tw % bk._LO == 0
    for i, (off, length) in enumerate(calls):
        assert length == tw and off == 512 + i * tw
    assert calls[-1][0] + tw >= 512 + T


def test_time_window_respects_caller_bin_offset():
    # Regression: a caller-supplied bin_offset must shift every window,
    # not be silently dropped by the time decomposition.
    room = smoll_room(n_bands=32)
    p = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    key = jax.random.PRNGKey(4)
    T = 48128
    kw = dict(n_rays=256, max_bounces=4, sample_rate=48000, ir_length=T)
    a = np.asarray(bk.trace_frame_ir_whole(room.scene, p, key, **kw))
    b = np.asarray(bk.trace_frame_ir_whole(room.scene, p, key,
                                           bin_offset=512, **kw))
    # b covers IR samples [512, 512+T): the overlap must be bit-equal
    np.testing.assert_array_equal(b[:, :T - 512], a[:, 512:])


def test_accel_time_windowed_matches_unwindowed_whole():
    # Large-scene accel path with an over-VMEM histogram (K=32 x 48k
    # bins): runs as IR time windows. Partition invariance vs a
    # different window size, bit-exact (host-threefry uniforms, so the
    # accel kernel is also bit-comparable across partitions).
    room = smoll_room(n_bands=32)
    p = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    key = jax.random.PRNGKey(6)
    T = 48128
    assert bk.listener_block(32, T) == 0
    kw = dict(n_rays=128, max_bounces=3, sample_rate=48000, ir_length=T,
              n_frames=1, in_kernel_rng=False)
    a = np.asarray(bk.trace_frames_ir_accel(room.scene, p, key, **kw))
    assert a.shape == (1, T, 32)
    assert a.sum() > 0
    orig = bk.time_window
    bk.time_window = lambda n_bands: 16384
    try:
        b = np.asarray(bk.trace_frames_ir_accel.__wrapped__(
            room.scene, p, key, **kw))
    finally:
        bk.time_window = orig
    np.testing.assert_array_equal(a, b)
