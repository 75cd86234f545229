"""Differentiable acoustics (`diff.py`): gradient correctness vs finite
differences, material-group inference, and inverse material recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from realisticaudioraytracing2d_tpu import diff
from realisticaudioraytracing2d_tpu.models.materials import AudioMaterial
from realisticaudioraytracing2d_tpu.models.rooms import shoebox_room
from realisticaudioraytracing2d_tpu.models.scene import Transform2D
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams

SR = 8000
IR_LEN = 512          # 64 ms at 8 kHz — covers a 4x4 m shoebox at 4 bounces
N_RAYS = 64
BOUNCES = 4


def _setup(absorption=0.3, scattering=0.4, obstacle=False):
    mat = AudioMaterial(absorption=absorption, scattering=scattering)
    obstacles = None
    if obstacle:
        obstacles = [(Transform2D((0.8, -0.8), 0.3, (0.6, 0.6)),
                      AudioMaterial(absorption=0.7, scattering=0.1))]
    scene = shoebox_room(4.0, 4.0, wall_material=mat, obstacles=obstacles)
    params = TraceParams.make(source=(-1.0, 0.0), listeners=(1.0, 0.3),
                              listener_radius=0.5)
    return scene, params


def _sim(scene, params, key, frames=1):
    return diff.simulate_ir(scene, params, key, n_rays=N_RAYS,
                            max_bounces=BOUNCES, sample_rate=SR,
                            ir_length=IR_LEN, frames=frames)


def test_infer_groups_partitions_by_material():
    scene, _ = _setup(obstacle=True)
    groups, n_groups = diff.infer_material_groups(scene)
    mask = np.asarray(scene.mask)
    # walls + obstacle (+ possibly a padding group)
    real_groups = set(groups[mask].tolist())
    assert len(real_groups) == 2
    # all four shoebox walls (first 16 segments) share one group
    assert len(set(groups[:16].tolist())) == 1


def test_apply_materials_roundtrip_and_padding():
    scene, _ = _setup(obstacle=True)
    groups, n_groups = diff.infer_material_groups(scene)
    mp = diff.MaterialParams.from_scene(scene, groups, n_groups)
    out = diff.apply_materials(
        scene, groups, mp,
        fields=("absorption", "scattering", "transmission"))
    np.testing.assert_allclose(out.absorption, scene.absorption, atol=2e-4)
    np.testing.assert_allclose(out.scattering, scene.scattering, atol=2e-4)
    np.testing.assert_allclose(out.transmission, scene.transmission,
                               atol=2e-4)
    # padding rows bit-identical (mask guard, not just logit round-trip)
    pad = ~np.asarray(scene.mask)
    if pad.any():
        np.testing.assert_array_equal(np.asarray(out.absorption)[pad],
                                      np.asarray(scene.absorption)[pad])
    # geometry untouched
    assert out.a is scene.a and out.ior is scene.ior


def test_gradient_matches_central_difference(key):
    scene, params = _setup()
    groups, n_groups = diff.infer_material_groups(scene)
    mp0 = diff.MaterialParams.from_scene(scene, groups, n_groups)

    def loss_at(delta):
        mp = mp0._replace(absorption=mp0.absorption + delta)
        sc = diff.apply_materials(scene, jnp.asarray(groups), mp)
        return jnp.sum(_sim(sc, params, key))

    g = jax.grad(loss_at)(jnp.zeros_like(mp0.absorption))
    eps = 1e-3
    for gidx in range(n_groups):
        e = jnp.zeros_like(mp0.absorption).at[gidx].set(eps)
        fd = (loss_at(e) - loss_at(-e)) / (2 * eps)
        ad = jnp.sum(g[gidx])
        if abs(float(fd)) < 1e-7 and abs(float(ad)) < 1e-7:
            continue  # group never hit (e.g. padding)
        np.testing.assert_allclose(float(ad), float(fd), rtol=5e-2)


def test_fit_recovers_absorption(key):
    true_scene, params = _setup(absorption=0.45)
    target = _sim(true_scene, params, jax.random.PRNGKey(7), frames=4)

    start_scene, _ = _setup(absorption=0.12)
    result = diff.fit_materials(
        start_scene, params, target, key,
        n_rays=N_RAYS, max_bounces=BOUNCES, sample_rate=SR,
        frames=1, fields=("absorption",), loss="edc",
        steps=60, lr=0.1)

    # Per-step losses are noisy (fresh MC draw each step) — compare the
    # trajectory's head/tail means, then the actual recovered parameter.
    losses = np.asarray(result.losses)
    assert losses[-10:].mean() < 0.65 * losses[:10].mean(), losses
    groups, n_groups = diff.infer_material_groups(start_scene)
    fitted_abs = np.asarray(jax.nn.sigmoid(result.params.absorption))
    wall_group = int(groups[0])
    assert abs(float(fitted_abs[wall_group, 0]) - 0.45) < 0.08, fitted_abs


def test_simulate_ir_multiframe_matches_mean(key):
    scene, params = _setup()
    multi = _sim(scene, params, key, frames=3)
    keys = jax.random.split(key, 3)
    manual = jnp.mean(jnp.stack([_sim(scene, params, k) for k in keys]),
                      axis=0)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(manual),
                               rtol=1e-6, atol=1e-8)


def test_scattering_gradient_finite_on_refractive_scene(key):
    """Regression: ray_circle_intersect's sqrt-of-clamp had an inf backward
    for every ray missing the listener circle, turning scattering gradients
    into NaN on any scene (first seen on SmollRoom, whose transmissive
    slant wall exercises the full refraction path)."""
    from realisticaudioraytracing2d_tpu.models import rooms

    room = rooms.smoll_room()
    params = TraceParams.make(room.source, room.listener,
                              listener_radius=room.listener_radius)
    groups, n_groups = diff.infer_material_groups(room.scene)
    mp = diff.MaterialParams.from_scene(room.scene, groups, n_groups)

    def objective(mp):
        sc = diff.apply_materials(room.scene, jnp.asarray(groups), mp,
                                  ("absorption", "scattering"))
        pred = diff.simulate_ir(sc, params, key, n_rays=64, max_bounces=4,
                                sample_rate=SR, ir_length=IR_LEN)
        return jnp.sum(pred)

    g = jax.grad(objective)(mp)
    for leaf in g:
        assert np.isfinite(np.asarray(leaf)).all(), leaf
