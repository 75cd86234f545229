"""Trace kernel physics tests (semantics of Raytrace2D.compute:49-156).

Property tests per SURVEY.md section 4: inverse-square decay, direct-path
delay = dist/c, determinism, masking correctness, wallDepth gating.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.models.materials import (
    MATERIAL_ANECHOIC, AudioMaterial)
from realisticaudioraytracing2d_tpu.models.rooms import smoll_room
from realisticaudioraytracing2d_tpu.models.scene import (SceneBuilder,
                                                         Transform2D)
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams, trace

C = 343.0


def empty_scene(n_bands=1):
    """A scene whose only wall is far away and fully absorbing — effectively
    free field for a source/listener near the origin."""
    b = SceneBuilder(n_bands=n_bands)
    b.add_box(MATERIAL_ANECHOIC, Transform2D((1e4, 1e4)), size=(1.0, 1.0))
    return b.build(pad_to=8)


def run(scene, src, lis, radius=0.5, gain=1.0, rays=4096, bounces=3, seed=0):
    p = TraceParams.make(src, lis, radius, C, gain)
    hits, _ = trace(scene, p, jax.random.PRNGKey(seed), n_rays=rays,
                    max_bounces=bounces)
    return hits


def test_free_field_direct_delay_and_energy():
    # Listener 10 m away; direct capture enters the circle at dist-r.
    hits = run(empty_scene(), [0.0, 0.0], [10.0, 0.0], radius=0.5)
    v = np.asarray(hits.valid)
    assert v[:, 0].sum() > 0            # some direct captures
    assert v[:, 1].sum() == 0           # nothing to NEE off
    d = np.asarray(hits.delay)[:, 0][v[:, 0]]
    e = np.asarray(hits.energy)[:, 0][v[:, 0][..., None]]
    t_expect = (10.0 - 0.5) / C         # circle entry point
    assert d.min() == pytest.approx(t_expect, rel=1e-3)
    # energy = gain / max(1, totalD^2), totalD in [9.5, ~10.01]
    assert e.max() == pytest.approx(1.0 / 9.5**2, rel=1e-2)
    assert e.min() >= 1.0 / (10.2**2)


def test_free_field_capture_fraction_matches_solid_angle():
    # Fraction of rays hitting a circle of radius r at distance L is
    # asin(r/L)/pi for stratified angular emission.
    hits = run(empty_scene(), [0.0, 0.0], [10.0, 0.0], radius=0.5,
               rays=16384, bounces=1)
    frac = np.asarray(hits.valid)[:, 0].sum() / 16384
    expect = np.arcsin(0.5 / 10.0) / np.pi
    assert frac == pytest.approx(expect, rel=0.15)


def test_energy_never_exceeds_gain():
    room = smoll_room()
    hits = run(room.scene, room.source, room.listener, gain=2.0, rays=4096,
               bounces=5)
    e = np.asarray(hits.energy)[np.asarray(hits.valid)]
    assert e.size > 0
    assert e.max() <= 2.0 + 1e-6


def test_determinism_same_key_bitwise():
    room = smoll_room()
    h1 = run(room.scene, room.source, room.listener, seed=3)
    h2 = run(room.scene, room.source, room.listener, seed=3)
    np.testing.assert_array_equal(np.asarray(h1.delay), np.asarray(h2.delay))
    np.testing.assert_array_equal(np.asarray(h1.energy),
                                  np.asarray(h2.energy))
    np.testing.assert_array_equal(np.asarray(h1.valid), np.asarray(h2.valid))


def test_different_keys_differ():
    room = smoll_room()
    h1 = run(room.scene, room.source, room.listener, seed=3)
    h2 = run(room.scene, room.source, room.listener, seed=4)
    assert not np.array_equal(np.asarray(h1.valid), np.asarray(h2.valid))


def test_occluder_blocks_direct_path():
    # Fully absorbing, opaque wall between source and listener: no direct
    # captures and (single wall, absorption 1) no NEE energy either.
    blocker = AudioMaterial(absorption=1.0, scattering=0.0, transmission=0.0,
                            ior=1.0, name="block")
    b = SceneBuilder()
    b.add_box(blocker, Transform2D((5.0, 0.0), 0.0, (1.0, 40.0)))
    scene = b.build(pad_to=8)
    hits = run(scene, [0.0, 0.0], [10.0, 0.0], rays=4096, bounces=3)
    assert np.asarray(hits.valid).sum() == 0


def test_nee_contribution_from_reflective_wall():
    # A single reflective wall behind the source: NEE hits must appear and
    # arrive later than the direct path.
    refl = AudioMaterial(absorption=0.1, scattering=0.0, transmission=0.0,
                         ior=1.0, name="mirror")
    b = SceneBuilder()
    b.add_box(refl, Transform2D((-5.0, 0.0), 0.0, (1.0, 40.0)))
    scene = b.build(pad_to=8)
    hits = run(scene, [0.0, 0.0], [10.0, 0.0], rays=8192, bounces=2)
    v = np.asarray(hits.valid)
    assert v[:, 0].sum() > 0 and v[:, 1].sum() > 0
    direct_t = np.asarray(hits.delay)[:, 0][v[:, 0]].min()
    nee_t = np.asarray(hits.delay)[:, 1][v[:, 1]].min()
    # reflected path >= (4.5 + 14.5) m vs direct 9.5 m
    assert nee_t > direct_t
    assert nee_t == pytest.approx((4.5 + 14.5 + 0.5) / C, rel=0.1)


def test_transmissive_wall_passes_energy():
    # transmission=1, ior=1 (no refraction bend): rays pass through;
    # listener behind the wall still hears a direct-ish arrival (captured
    # after the ray exits, wallDepth back to 0).
    glass = AudioMaterial(absorption=0.0, scattering=0.0, transmission=1.0,
                          ior=1.0, name="air-wall")
    b = SceneBuilder()
    b.add_box(glass, Transform2D((5.0, 0.0), 0.0, (1.0, 40.0)))
    scene = b.build(pad_to=8)
    hits = run(scene, [0.0, 0.0], [10.0, 0.0], rays=4096, bounces=4)
    v = np.asarray(hits.valid)
    assert v[:, 0].sum() > 0
    d = np.asarray(hits.delay)[:, 0][v[:, 0]]
    assert d.min() == pytest.approx(9.5 / C, rel=0.05)


def test_wall_depth_gates_capture():
    # With ior != 1 inside the wall, a listener *inside* the wall volume
    # (depth > 0 region) must get no direct captures because capture is
    # gated on wallDepth == 0 (Raytrace2D.compute:74).
    glass = AudioMaterial(absorption=0.0, scattering=0.0, transmission=1.0,
                          ior=1.0, name="air-wall")
    b = SceneBuilder()
    b.add_box(glass, Transform2D((5.0, 0.0), 0.0, (4.0, 40.0)))
    scene = b.build(pad_to=8)
    # listener centered inside the wall slab (x in [3, 7])
    hits = run(scene, [0.0, 0.0], [5.0, 0.0], radius=0.4, rays=4096,
               bounces=4)
    v = np.asarray(hits.valid)
    assert v[:, 0].sum() == 0


def test_speed_change_in_medium_delays_arrival():
    # ior=2 -> in-wall speed c/2; straight-through listener behind a slab
    # should arrive later than geometric distance/c.
    slow = AudioMaterial(absorption=0.0, scattering=0.0, transmission=1.0,
                         ior=2.0, name="slow")
    b = SceneBuilder()
    b.add_box(slow, Transform2D((5.0, 0.0), 0.0, (4.0, 60.0)))
    scene = b.build(pad_to=8)
    hits = run(scene, [0.0, 0.0], [12.0, 0.0], radius=0.8, rays=8192,
               bounces=6)
    v = np.asarray(hits.valid)[:, 0]
    assert v.sum() > 0
    d = np.asarray(hits.delay)[:, 0][v]
    # normal-incidence path: 3 m air + 4 m slab at c/2 + ~4.2 m air
    t_fast_geo = (12.0 - 0.8) / C
    assert d.min() > t_fast_geo * 1.2


def test_banded_energy_shapes_and_ordering():
    # Higher bands absorb more -> after a bounce, band energies decrease.
    mat = AudioMaterial(absorption=0.2, scattering=0.0, transmission=0.0,
                        band_absorption=(0.1, 0.3, 0.6), name="b")
    b = SceneBuilder(n_bands=3)
    b.add_box(mat, Transform2D((-5.0, 0.0), 0.0, (1.0, 40.0)))
    scene = b.build(pad_to=8)
    hits = run(scene, [0.0, 0.0], [10.0, 0.0], rays=4096, bounces=2)
    assert hits.energy.shape[-1] == 3
    v = np.asarray(hits.valid)[:, 1]
    e = np.asarray(hits.energy)[:, 1][v]  # [n, 3]
    assert v.sum() > 0
    assert np.all(e[:, 0] >= e[:, 1]) and np.all(e[:, 1] >= e[:, 2])


def test_multi_listener_axis():
    room = smoll_room()
    listeners = np.stack([room.listener, room.listener + [1.0, 0.0]])
    p = TraceParams.make(room.source, listeners, 0.5, C, 1.0)
    hits, _ = trace(room.scene, p, jax.random.PRNGKey(0), n_rays=2048,
                    max_bounces=3)
    assert hits.valid.shape[-1] == 2
    v = np.asarray(hits.valid)
    assert v[..., 0].sum() > 0 and v[..., 1].sum() > 0
    # the two ears hear different things
    assert not np.array_equal(v[..., 0], v[..., 1])


def test_debug_paths_shape_and_start():
    room = smoll_room()
    p = TraceParams.make(room.source, room.listener, 0.5, C, 1.0)
    hits, dbg = trace(room.scene, p, jax.random.PRNGKey(0), n_rays=512,
                      max_bounces=4, n_debug=16)
    assert dbg.pos.shape == (5, 16, 2)
    np.testing.assert_allclose(np.asarray(dbg.pos[0]),
                               np.tile(room.source, (16, 1)), atol=1e-5)


def test_vmap_over_sources():
    room = smoll_room()
    sources = jnp.asarray([[-18.0, 9.0], [-10.0, 5.0], [0.0, 8.0]])

    def one(src):
        p = TraceParams.make(src, room.listener, 0.5, C, 1.0)
        hits, _ = trace(room.scene, p, jax.random.PRNGKey(0), n_rays=512,
                        max_bounces=3)
        return hits.valid.sum()

    counts = jax.vmap(one)(sources)
    assert counts.shape == (3,)
    assert all(int(c) > 0 for c in counts)
