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


def test_soft_scatter_matches_hard_energy_and_shift(key):
    """The linear splat conserves deposited energy exactly and moves no
    energy further than one bin from the hard binning."""
    from realisticaudioraytracing2d_tpu.ops import ir as irm
    from realisticaudioraytracing2d_tpu.ops.trace import trace_hits_only

    scene, params = _setup()
    hits = trace_hits_only(scene, params, key, n_rays=N_RAYS,
                           max_bounces=BOUNCES)
    hard = np.asarray(irm.scatter_hits(hits, SR, IR_LEN))
    soft = np.asarray(irm.scatter_hits_soft(hits, SR, IR_LEN))
    assert hard.sum() > 0
    # Interior energy matches up to boundary effects (a hit in the last
    # bin splats half out of range in soft; exclude the edge bins).
    np.testing.assert_allclose(soft[:, 1:-1].sum(), hard[:, 1:-1].sum(),
                               rtol=0.02)
    # One-bin smear: hard IR convolved with [1,1,1] dominates soft support.
    support_hard = np.convolve(
        (hard.sum(axis=(0, 2)) > 0).astype(float), [1, 1, 1],
        mode="same") > 0
    assert np.all(support_hard[soft.sum(axis=(0, 2)) > 1e-12])


def test_soft_scatter_delay_gradient_matches_fd(key):
    """d(IR)/d(delay) through the soft splat matches finite differences —
    the gradient the hard floor binning destroys (its a.e. derivative in
    delay is exactly zero). Uses the IR's first moment, which is exactly
    linear in the in-range hit delays, so AD and FD must agree tightly.
    Path topology (which rays hit what) is held fixed by scaling the
    delays of one traced hit set rather than re-tracing."""
    from realisticaudioraytracing2d_tpu.ops import ir as irm
    from realisticaudioraytracing2d_tpu.ops.trace import trace_hits_only

    scene, params = _setup()
    hits = trace_hits_only(scene, params, key, n_rays=N_RAYS,
                           max_bounces=BOUNCES)

    def moment(scale, scatter):
        h = hits._replace(delay=hits.delay * scale)
        ir = scatter(h, SR, IR_LEN)
        t = jnp.arange(IR_LEN, dtype=jnp.float32)
        return jnp.sum(ir.sum(axis=(0, 2)) * t)

    g_soft = jax.grad(moment)(jnp.asarray(1.0), irm.scatter_hits_soft)
    eps = 1e-4
    fd = (moment(jnp.asarray(1.0 + eps), irm.scatter_hits_soft)
          - moment(jnp.asarray(1.0 - eps), irm.scatter_hits_soft)) / (2 * eps)
    assert float(jnp.abs(g_soft)) > 0
    np.testing.assert_allclose(float(g_soft), float(fd), rtol=1e-2)

    # ... and the hard scatter's delay gradient is identically zero.
    g_hard = jax.grad(moment)(jnp.asarray(1.0), irm.scatter_hits)
    assert float(g_hard) == 0.0


def test_localize_source_single_listener(key):
    """One microphone localizes the source: the first arrival fixes a
    range circle, the reflection pattern picks the point on it."""
    scene, _ = _setup()
    true_params = TraceParams.make(source=(-1.0, 0.4), listeners=(1.0, 0.3),
                                   listener_radius=0.5)
    target = diff.simulate_ir(scene, true_params, jax.random.PRNGKey(0),
                              n_rays=256, max_bounces=BOUNCES,
                              sample_rate=SR, ir_length=IR_LEN, soft=True)
    result = diff.localize_source(
        scene, true_params, target, jax.random.PRNGKey(0),
        n_rays=256, max_bounces=BOUNCES, sample_rate=SR,
        n_starts=6, steps=150)
    err = float(jnp.linalg.norm(result.position - true_params.source))
    assert err < 0.15, (np.asarray(result.position), err,
                        np.asarray(result.positions),
                        np.asarray(result.losses))


def test_fit_recovers_ior(key):
    """ior's signal is the propagation delay through transmissive media
    (speed = c/ior): fittable only with the soft splat + blurred loss."""
    def setup(ior):
        wall = AudioMaterial(absorption=0.3, scattering=0.2)
        obst = AudioMaterial(absorption=0.05, scattering=0.0,
                             transmission=1.0, ior=ior)
        scene = shoebox_room(
            4.0, 4.0, wall_material=wall,
            obstacles=[(Transform2D((0.0, 0.0), 0.0, (1.0, 2.5)), obst)])
        params = TraceParams.make(source=(-1.4, 0.0), listeners=(1.4, 0.1),
                                  listener_radius=0.4)
        return scene, params

    sr, ir_len, rays, bounces = 16000, 1024, 256, 6
    true_scene, params = setup(0.5)
    target = diff.simulate_ir(true_scene, params, jax.random.PRNGKey(0),
                              n_rays=rays, max_bounces=bounces,
                              sample_rate=sr, ir_length=ir_len, soft=True)
    start_scene, _ = setup(1.8)
    groups, _ = diff.infer_material_groups(start_scene)
    result = diff.fit_materials(
        start_scene, params, target, jax.random.PRNGKey(0),
        n_rays=rays, max_bounces=bounces, sample_rate=sr,
        fields=("ior",), loss="blur", soft=True, resample=False,
        steps=70, lr=0.1)
    g_obst = int(groups[16])  # first obstacle segment after 4x4 box walls
    fitted_ior = float(np.asarray(result.params.constrained()[3])[g_obst])
    assert abs(fitted_ior - 0.5) < 0.1, fitted_ior
    # non-fitted fields untouched
    np.testing.assert_allclose(np.asarray(result.scene.absorption),
                               np.asarray(start_scene.absorption))


def test_blur_preserves_length_for_short_irs():
    """Regression: mode='same' convolution returned the KERNEL length
    (193) whenever T < 193, silently re-centering short IRs' time axis."""
    ir = jnp.zeros((1, 128, 1)).at[0, 60, 0].set(1.0)
    out = diff.gaussian_blur_time(ir, jnp.asarray(4.0))
    assert out.shape == (1, 128, 1)
    assert int(jnp.argmax(out[0, :, 0])) == 60
    np.testing.assert_allclose(float(out.sum()), 1.0, rtol=1e-5)


def test_first_arrival_raises_on_empty_listener():
    """Regression: an all-zero listener IR produced a spurious bin-0
    'arrival' that pulled localization onto that listener's circle."""
    import pytest
    with pytest.raises(ValueError, match="all-zero"):
        diff.first_arrival_times(np.zeros((2, 100, 1)), 8000)


def test_fit_rejects_unknown_fields(key):
    """Regression: a misspelled field silently made the fit a no-op."""
    import pytest
    scene, params = _setup()
    with pytest.raises(ValueError, match="unknown material fields"):
        diff.fit_materials(scene, params, jnp.zeros((1, IR_LEN, 1)), key,
                           n_rays=8, max_bounces=2, sample_rate=SR,
                           fields=("absorbtion",), steps=1)


def test_tangent_circle_gradient_finite():
    """Regression: exact float32 tangency (d2 == r2) still evaluated sqrt
    at 0, whose backward is inf — same class as the miss-branch NaN."""
    from realisticaudioraytracing2d_tpu.ops.geometry import \
        ray_circle_intersect

    def t_of(o):
        return ray_circle_intersect(o, jnp.array([1.0, 0.0]),
                                    jnp.array([5.0, 1.0]), jnp.asarray(1.0))

    g = jax.grad(t_of)(jnp.array([0.0, 0.0]))  # ray exactly tangent
    assert np.isfinite(np.asarray(g)).all()


def test_localize_sharded_matches_unsharded():
    """Starts sharded over an 8-device mesh match the single-device vmap
    (embarrassingly parallel; tolerances cover XLA fusion differences
    between the two compiled programs, amplified by 8 Adam steps)."""
    from realisticaudioraytracing2d_tpu.parallel.mesh import make_mesh

    scene, _ = _setup()
    params = TraceParams.make(source=(-1.0, 0.4), listeners=(1.0, 0.3),
                              listener_radius=0.5)
    target = diff.simulate_ir(scene, params, jax.random.PRNGKey(0),
                              n_rays=64, max_bounces=BOUNCES,
                              sample_rate=SR, ir_length=IR_LEN, soft=True)
    kw = dict(n_rays=64, max_bounces=BOUNCES, sample_rate=SR,
              n_starts=8, steps=8)
    plain = diff.localize_source(scene, params, target,
                                 jax.random.PRNGKey(0), **kw)
    mesh = make_mesh(axis_names=("rooms",))
    sharded = diff.localize_source(scene, params, target,
                                   jax.random.PRNGKey(0), mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(plain.positions),
                               np.asarray(sharded.positions),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(plain.losses),
                               np.asarray(sharded.losses),
                               rtol=1e-3)


def test_localize_warm_start_tracks_motion():
    """Warm-started localization (`starts=`) follows a moving source
    chunk to chunk — the tracking mode of examples/track_source.py."""
    scene, _ = _setup()
    params = TraceParams.make(source=(0.0, 0.0), listeners=(1.2, 0.8),
                              listener_radius=0.5)
    path = np.array([[-1.0, -0.6], [-0.8, -0.35], [-0.6, -0.15]],
                    np.float32)
    prev = path[0] + np.array([0.15, -0.1], np.float32)  # approx known
    errs = []
    for true_src in path:
        p = params._replace(source=jnp.asarray(true_src))
        target = diff.simulate_ir(scene, p, jax.random.PRNGKey(0),
                                  n_rays=128, max_bounces=BOUNCES,
                                  sample_rate=SR, ir_length=IR_LEN,
                                  soft=True)
        ring = prev[None, :] + 0.2 * np.array(
            [[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1]], np.float32)
        result = diff.localize_source(
            scene, params, target, jax.random.PRNGKey(0),
            n_rays=128, max_bounces=BOUNCES, sample_rate=SR,
            starts=ring, steps=40, sigma0=10.0, anneal_steps=15.0)
        prev = np.asarray(result.position)
        errs.append(float(np.linalg.norm(prev - true_src)))
    assert np.mean(errs) < 0.25, errs
    assert errs[-1] < 0.25, errs


def test_localize_hard_binned_target():
    """The realistic CLI scenario: the target comes from `trace --ir-out`,
    i.e. HARD-binned and multi-frame, while the fit's forward model is the
    soft splat. The blur absorbs the one-bin mismatch."""
    scene, _ = _setup()
    params = TraceParams.make(source=(-1.0, 0.4), listeners=(1.0, 0.3),
                              listener_radius=0.5)
    target = diff.simulate_ir(scene, params, jax.random.PRNGKey(0),
                              n_rays=256, max_bounces=BOUNCES,
                              sample_rate=SR, ir_length=IR_LEN,
                              soft=False, frames=4)
    result = diff.localize_source(
        scene, params, target, jax.random.PRNGKey(0),
        n_rays=256, max_bounces=BOUNCES, sample_rate=SR,
        n_starts=6, steps=150)
    err = float(jnp.linalg.norm(result.position - params.source))
    assert err < 0.15, (np.asarray(result.position), err)


def test_localize_gain_invariant_handles_uncalibrated_target():
    """A target IR with an unknown absolute level (scaled 7.3x) still
    localizes when the IR term projects out the optimal gain."""
    scene, _ = _setup()
    params = TraceParams.make(source=(-1.0, 0.4), listeners=(1.0, 0.3),
                              listener_radius=0.5)
    target = diff.simulate_ir(scene, params, jax.random.PRNGKey(0),
                              n_rays=256, max_bounces=BOUNCES,
                              sample_rate=SR, ir_length=IR_LEN, soft=True)
    result = diff.localize_source(
        scene, params, 7.3 * target, jax.random.PRNGKey(0),
        n_rays=256, max_bounces=BOUNCES, sample_rate=SR,
        n_starts=6, steps=150, gain_invariant=True)
    err = float(jnp.linalg.norm(result.position - params.source))
    assert err < 0.15, (np.asarray(result.position), err)


def test_localize_two_simultaneous_sources():
    """Two sources emitting at once are recovered jointly from one mixed
    IR at two microphones (permutation-invariant match)."""
    scene, _ = _setup()
    params = TraceParams.make(source=(0.0, 0.0),
                              listeners=[(1.2, 0.8), (-1.2, -0.9)],
                              listener_radius=0.4)
    true_srcs = jnp.array([[-1.0, 0.4], [0.9, -1.1]])
    key = jax.random.PRNGKey(0)

    def forward(srcs):
        def one(s, k):
            return diff.simulate_ir(scene, params._replace(source=s), k,
                                    n_rays=256, max_bounces=BOUNCES,
                                    sample_rate=SR, ir_length=IR_LEN,
                                    soft=True)
        return jnp.sum(
            jax.vmap(one)(srcs, jax.random.split(key, srcs.shape[0])),
            axis=0)

    target = forward(true_srcs)
    # Bounds: the room INTERIOR — the default outer-hull AABB includes the
    # wall band, where a hypothesis point traces nothing (loss plateaus),
    # and with 2 points per hypothesis the interior-hit chance drops
    # quadratically.
    result = diff.localize_source(
        scene, params, target, key, n_rays=256, max_bounces=BOUNCES,
        sample_rate=SR, n_sources=2, n_starts=12, steps=200,
        anneal_steps=30.0,
        bounds=np.array([[-1.6, -1.6], [1.6, 1.6]], np.float32))
    fitted = np.asarray(result.position)
    assert fitted.shape == (2, 2)
    tn = np.asarray(true_srcs)
    err = min(np.linalg.norm(fitted - tn, axis=1).mean(),
              np.linalg.norm(fitted[::-1] - tn, axis=1).mean())
    assert err < 0.15, (fitted, err, np.asarray(result.losses))


def test_scene_bounds_covers_walls():
    scene, _ = _setup()
    lo, hi = diff.scene_bounds(scene, shrink=0.0)
    # Outer AABB contains the 4x4 interior (walls have thickness), is
    # finite, and shrink pulls it inward.
    assert np.all(lo <= -2.0) and np.all(hi >= 2.0)
    assert np.all(np.isfinite(lo)) and np.all(np.isfinite(hi))
    lo_s, hi_s = diff.scene_bounds(scene, shrink=0.1)
    assert np.all(lo_s > lo) and np.all(hi_s < hi)


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


# -- transmission surrogate (importance-sampled branch relaxation) -----------

def _setup_transmissive(transmission):
    """Shoebox with a vertical divider between source and listener: the
    listener-side energy depends strongly on the divider's transmission
    (the round-3 VERDICT 'two-group fixture' for transmission fitting)."""
    mat = AudioMaterial(absorption=0.3, scattering=0.2)
    divider = AudioMaterial(absorption=0.1, scattering=0.0,
                            transmission=transmission)
    scene = shoebox_room(
        4.0, 4.0, wall_material=mat,
        obstacles=[(Transform2D((0.0, 0.0), 0.0, (0.2, 3.0)), divider)])
    params = TraceParams.make(source=(-1.2, 0.0), listeners=(1.2, 0.2),
                              listener_radius=0.5)
    return scene, params


def _sim_t(scene, params, key, frames=1, surrogate=False, n_rays=64):
    return diff.simulate_ir(scene, params, key, n_rays=n_rays,
                            max_bounces=BOUNCES, sample_rate=SR,
                            ir_length=IR_LEN, frames=frames,
                            transmission_surrogate=surrogate)


def _divider_group(scene):
    groups, _ = diff.infer_material_groups(scene)
    mask = np.asarray(scene.mask) & (np.asarray(scene.transmission) > 0)
    return groups, int(groups[mask][0])


def test_transmission_surrogate_identity_when_all_walls_opaque(key):
    """With every transmission exactly 0 the surrogate's proposal q is 0,
    its weight is 1, and the forward is bit-identical to the hard branch."""
    scene, params = _setup_transmissive(0.0)
    a = np.asarray(_sim_t(scene, params, key))
    b = np.asarray(_sim_t(scene, params, key, surrogate=True))
    np.testing.assert_array_equal(a, b)


def test_transmission_surrogate_forward_is_unbiased(key):
    """At t = 0.5 (proposal == target) and generally, the surrogate's
    expected IR matches the hard forward: total energy within 2% and the
    EDC within 10% above a -30 dB floor at a 64-frame budget."""
    scene, params = _setup_transmissive(0.5)
    hard = np.asarray(_sim_t(scene, params, jax.random.PRNGKey(1),
                             frames=64, n_rays=512))
    surr = np.asarray(_sim_t(scene, params, jax.random.PRNGKey(2),
                             frames=64, n_rays=512, surrogate=True))
    assert abs(hard.sum() - surr.sum()) / hard.sum() < 0.02
    e_h = np.cumsum(hard[0, ::-1, 0])[::-1]
    e_s = np.cumsum(surr[0, ::-1, 0])[::-1]
    sl = e_h > e_h[0] * 1e-3
    assert (np.abs(e_h[sl] - e_s[sl]) / e_h[sl]).max() < 0.10


def test_transmission_gradient_matches_fd_of_hard_expectation():
    """The surrogate's autodiff d(total energy)/d(transmission) agrees
    with central finite differences of the HARD forward's expectation
    (each averaged over keys; measured 11.67 +/- 0.24 vs 11.74 +/- 0.29
    at this fixture/budget)."""
    scene, params = _setup_transmissive(0.5)
    groups, div_group = _divider_group(scene)
    mp0 = diff.MaterialParams.from_scene(scene, np.asarray(groups),
                                         int(groups.max()) + 1)

    @jax.jit
    def grad_dt(k):
        def total_energy(tr):
            mp = mp0._replace(
                transmission=mp0.transmission.at[div_group].set(
                    jnp.log(tr) - jnp.log1p(-tr)))
            fitted = diff.apply_materials(scene, jnp.asarray(groups), mp,
                                          ("transmission",))
            return jnp.sum(_sim_t(fitted, params, k, frames=8, n_rays=512,
                                  surrogate=True))
        return jax.grad(total_energy)(jnp.float32(0.5))

    g = np.mean([float(grad_dt(jax.random.PRNGKey(i))) for i in range(6)])

    def hard_energy(t, k):
        sc, _ = _setup_transmissive(t)
        return float(_sim_t(sc, params, k, frames=8, n_rays=512).sum())

    fd = np.mean([(hard_energy(0.6, jax.random.PRNGKey(100 + i))
                   - hard_energy(0.4, jax.random.PRNGKey(100 + i))) / 0.2
                  for i in range(6)])
    assert fd > 0 and g > 0
    assert abs(g - fd) / fd < 0.25, (g, fd)


def test_fit_recovers_transmission(key):
    """End-to-end: target from the HARD forward at divider t = 0.6, fit
    with fields=("transmission",) (auto-enables the surrogate) from
    t = 0.15. EDC loss — the MSE term's early-bin noise stalls this
    fixture on a plateau (same effect as the two-group absorption study
    in docs/DIFF.md)."""
    true_scene, params = _setup_transmissive(0.6)
    target = _sim_t(true_scene, params, jax.random.PRNGKey(7), frames=4,
                    n_rays=256)
    start_scene, _ = _setup_transmissive(0.15)
    result = diff.fit_materials(
        start_scene, params, target, key,
        n_rays=256, max_bounces=BOUNCES, sample_rate=SR,
        frames=1, fields=("transmission",), loss="edc",
        steps=200, lr=0.1)
    _, div_group = _divider_group(start_scene)
    fit_t = float(np.asarray(
        jax.nn.sigmoid(result.params.transmission))[div_group])
    assert abs(fit_t - 0.6) < 0.15, fit_t
