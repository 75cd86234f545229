"""One-launch multi-source mixdown (sources on the rooms-batch grid axis
with shared scene tables) vs the jnp oracle path. Config #4 of
BASELINE.json; mixdown linearity per ``RayTraceManager`` semantics (the
reference has no multi-source mode — this is framework surplus, so the
oracle is our own jnp path)."""

import jax
import jax.numpy as jnp
import numpy as np

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams
from realisticaudioraytracing2d_tpu.parallel.multisource import (
    trace_sources_mixdown)


def test_one_launch_mixdown_matches_jnp_statistically():
    room = art.rooms.smoll_room()
    rng = np.random.default_rng(3)
    srcs = jnp.asarray(rng.uniform(-2, 2, size=(8, 2)).astype(np.float32))
    ears = jnp.asarray([[0.0, -3.68], [0.5, -3.68]], jnp.float32)
    gains = jnp.asarray(rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32))
    p = TraceParams.make(srcs, ears, 0.5, 343.0, gains)
    kw = dict(n_rays=4096, max_bounces=5, sample_rate=8000, ir_length=4800)
    key = jax.random.PRNGKey(9)
    fused = np.asarray(trace_sources_mixdown(room.scene, p, key,
                                             backend="fused", **kw))
    oracle = np.asarray(trace_sources_mixdown(room.scene, p, key,
                                              backend="jnp", **kw))
    assert fused.shape == oracle.shape == (2, 4800, 1)
    assert oracle.sum() > 0
    # different (key-deterministic) RNG streams: statistical parity
    assert abs(fused.sum() - oracle.sum()) / oracle.sum() < 0.1
    # per-ear energies distinct and matching across paths
    for ear in range(2):
        ef, eo = fused[ear].sum(), oracle[ear].sum()
        assert abs(ef - eo) / eo < 0.12
    assert not np.allclose(fused[0], fused[1])
    # determinism per key
    again = np.asarray(trace_sources_mixdown(room.scene, p, key,
                                             backend="fused", **kw))
    np.testing.assert_array_equal(fused, again)
