"""Pallas kernel parity tests (interpreter mode on CPU): the VMEM-tiled
intersection kernels must match the jnp brute-force path to float32
round-off (fused arithmetic may reorder, so ~1e-5 relative)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realisticaudioraytracing2d_tpu.models.rooms import smoll_room
from realisticaudioraytracing2d_tpu.ops import geometry as g
from realisticaudioraytracing2d_tpu.ops.pallas.trace_kernel import (
    nearest_hit_pallas, occlusion_min_pallas, pack_walls)
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams, trace


@pytest.fixture(scope="module")
def case(request):
    rng = np.random.default_rng(7)
    n, w = 700, 37  # deliberately unaligned sizes
    o = jnp.asarray(rng.uniform(-30, 30, (n, 2)), jnp.float32)
    ang = rng.uniform(0, 2 * np.pi, n)
    d = jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1), jnp.float32)
    a = jnp.asarray(rng.uniform(-30, 30, (w, 2)), jnp.float32)
    b = jnp.asarray(rng.uniform(-30, 30, (w, 2)), jnp.float32)
    return o, d, a, b


def test_pack_walls_shape(case):
    o, d, a, b = case
    packed = pack_walls(a, b)
    assert packed.shape == (8, 128)
    np.testing.assert_allclose(np.asarray(packed[0, :37]),
                               np.asarray(a[:, 0]))


def test_nearest_hit_parity(case):
    o, d, a, b = case
    packed = pack_walls(a, b)
    t_p, idx_p = nearest_hit_pallas(o, d, packed, tile_r=256)
    t_ref = g.pairwise_ray_segment_t(o, d, a, b)
    closest, idx = g.nearest_hit(t_ref)
    # fp ordering differs slightly (fused kernel vs XLA graph): ~1e-5 rel
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(closest),
                               rtol=5e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx))


def test_occlusion_parity(case):
    o, d, a, b = case
    packed = pack_walls(a, b)
    occ = occlusion_min_pallas(o.reshape(-1, 4, 2)[:100],
                               d.reshape(-1, 4, 2)[:100], packed,
                               tile_r=256)
    t_ref = g.pairwise_ray_segment_t(o.reshape(-1, 4, 2)[:100],
                                     d.reshape(-1, 4, 2)[:100], a, b)
    np.testing.assert_allclose(np.asarray(occ),
                               np.asarray(jnp.min(t_ref, axis=-1)),
                               rtol=5e-5, atol=1e-4)


def test_full_trace_pallas_vs_jnp():
    room = smoll_room()
    p = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    key = jax.random.PRNGKey(11)
    h_j, _ = trace(room.scene, p, key, n_rays=1024, max_bounces=4)
    h_p, _ = trace(room.scene, p, key, n_rays=1024, max_bounces=4,
                   use_pallas=True)
    np.testing.assert_array_equal(np.asarray(h_j.valid),
                                  np.asarray(h_p.valid))
    np.testing.assert_allclose(np.asarray(h_j.delay),
                               np.asarray(h_p.delay), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(h_j.energy),
                               np.asarray(h_p.energy), rtol=1e-5,
                               atol=1e-9)
