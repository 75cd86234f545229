"""Large-scene acceleration on the real chip: losslessness of the
cluster early-out at 10k walls and the expected speedup over brute force
(the docs/ACCEL.md round-2 plan made real)."""

import time

import jax
import numpy as np

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.models.rooms import city_scene
from realisticaudioraytracing2d_tpu.ops.pallas.bounce_kernel import (
    trace_frames_ir_accel_sorted)

KW = dict(n_rays=65536, max_bounces=6, sample_rate=16000, ir_length=24000,
          n_frames=2, cluster_size=128)


def test_accel_early_out_lossless_at_10k_walls():
    room = city_scene(n_boxes=2500)
    assert room.scene.n_walls >= 10000
    params = art.TraceParams.make(room.source, room.listener,
                                  room.listener_radius, 343.0, 100.0)
    key = jax.random.PRNGKey(0)
    a = np.asarray(trace_frames_ir_accel_sorted(
        room.scene, params, key, early_out=True, **KW))
    b = np.asarray(trace_frames_ir_accel_sorted(
        room.scene, params, key, early_out=False, **KW))
    assert a.sum() > 0
    np.testing.assert_array_equal(a, b)


def test_accel_banded_large_scene():
    # Round 2: banded (K>1) large scenes route to the one-launch accel
    # kernel instead of falling back to jnp. Early-out must stay lossless
    # with the band axis, and the engine's auto backend must pick it up.
    from realisticaudioraytracing2d_tpu.engine import (_accel_eligible,
                                                       trace_accumulate)
    from realisticaudioraytracing2d_tpu.ops.ir import IRState
    from realisticaudioraytracing2d_tpu.ops.pallas.bounce_kernel import (
        trace_frames_ir_accel)

    room = city_scene(n_boxes=1600, n_bands=8)
    assert room.scene.n_walls >= 6400 and room.scene.n_bands == 8
    params = art.TraceParams.make(room.source, room.listener,
                                  room.listener_radius, 343.0, 100.0)
    key = jax.random.PRNGKey(3)
    kw = dict(n_rays=16384, max_bounces=4, sample_rate=16000,
              ir_length=16384, n_frames=2, cluster_size=128)
    a = np.asarray(trace_frames_ir_accel(room.scene, params, key,
                                         early_out=True, **kw))
    b = np.asarray(trace_frames_ir_accel(room.scene, params, key,
                                         early_out=False, **kw))
    assert a.shape == (1, 16384, 8) and a.sum() > 0
    np.testing.assert_array_equal(a, b)
    # HF bands lose more energy than LF (materials' rolloff)
    assert a[..., -1].sum() < a[..., 0].sum()

    assert _accel_eligible(room.scene, params, 16384)
    st = trace_accumulate(room.scene, params, IRState.zeros(16384, 1, 8),
                          key, n_rays=16384, max_bounces=4,
                          sample_rate=16000, n_frames=2, backend="auto")
    assert int(st.frames) == 2 and float(st.sum.sum()) > 0


def test_accel_speedup_over_brute():
    # Wall-clock: the early-out must beat brute force by a healthy margin
    # at 10k walls (measured 1.95x at 10k, 5.5x at 40k; assert a loose
    # floor so the test isn't timing-flaky).
    room = city_scene(n_boxes=2500)
    params = art.TraceParams.make(room.source, room.listener,
                                  room.listener_radius, 343.0, 100.0)
    key = jax.random.PRNGKey(1)

    def timed(**extra):
        ir = trace_frames_ir_accel_sorted(room.scene, params, key,
                                          **KW, **extra)
        float(ir.sum())          # warm + sync
        t0 = time.perf_counter()
        ir = trace_frames_ir_accel_sorted(room.scene, params,
                                          jax.random.PRNGKey(2),
                                          **KW, **extra)
        float(ir.sum())
        return time.perf_counter() - t0

    t_brute = timed(early_out=False)
    t_accel = timed(early_out=True)
    assert t_brute / t_accel > 1.5, (t_brute, t_accel)
