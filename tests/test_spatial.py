"""Spatial (W/X/Y intensity) impulse responses — spatial.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realisticaudioraytracing2d_tpu import spatial as sp
from realisticaudioraytracing2d_tpu.engine import trace_accumulate
from realisticaudioraytracing2d_tpu.models.materials import AudioMaterial
from realisticaudioraytracing2d_tpu.models.scene import SceneBuilder
from realisticaudioraytracing2d_tpu.ops import directivity as dv
from realisticaudioraytracing2d_tpu.ops.ir import IRState
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams


def far_field():
    m = AudioMaterial(absorption=1.0, scattering=0.0, transmission=0.0,
                      ior=1.0)
    b = SceneBuilder(n_bands=1)
    b.add_segment((500.0, -1.0), (500.0, 1.0), (1.0, 0.0), m)
    return b.build()


def echo_scene():
    # reflective wall at x=10; source at origin, listener at (5, 0):
    # direct arrives from -x (bearing pi), the wall echo from +x (bearing 0)
    m = AudioMaterial(absorption=0.1, scattering=0.0, transmission=0.0,
                      ior=1.0)
    b = SceneBuilder(n_bands=1)
    b.add_segment((10.0, -20.0), (10.0, 20.0), (-1.0, 0.0), m)
    return b.build()


def box_room(side=8.0, absorption=0.3):
    # closed square, fully diffuse walls -> isotropic late field
    m = AudioMaterial(absorption=absorption, scattering=1.0,
                      transmission=0.0, ior=1.0)
    s = side / 2
    b = SceneBuilder(n_bands=1)
    b.add_segment((-s, -s), (s, -s), (0.0, 1.0), m)
    b.add_segment((s, -s), (s, s), (-1.0, 0.0), m)
    b.add_segment((s, s), (-s, s), (0.0, -1.0), m)
    b.add_segment((-s, s), (-s, -s), (1.0, 0.0), m)
    return b.build()


def run_spatial(scene, listener, rays=8192, bounces=2, ir_length=2048,
                sample_rate=8000, key=0, source=(0.0, 0.0)):
    p = TraceParams.make(np.float32(source), np.float32(listener),
                         listener_radius=0.5)
    ir, _ = sp.trace_spatial(scene, p, jax.random.PRNGKey(key),
                             n_rays=rays, max_bounces=bounces,
                             sample_rate=sample_rate, ir_length=ir_length)
    return ir


def test_w_channel_equals_plain_omni_ir():
    scene = far_field()
    ir = run_spatial(scene, (5.0, 0.0))
    p = TraceParams.make(np.float32([0.0, 0.0]), np.float32([5.0, 0.0]),
                         listener_radius=0.5)
    st = trace_accumulate(scene, p, IRState.zeros(2048),
                          jax.random.PRNGKey(0), n_rays=8192, max_bounces=2,
                          sample_rate=8000)
    np.testing.assert_allclose(np.asarray(ir.w), np.asarray(st.normalized()),
                               rtol=1e-6, atol=0)


def test_steer_matches_retraced_cardioid():
    # post-hoc steering == actually tracing with that mic pattern
    scene = echo_scene()
    aim = 0.7
    ir = run_spatial(scene, (5.0, 0.0))
    p = TraceParams.make(np.float32([0.0, 0.0]), np.float32([5.0, 0.0]),
                         listener_radius=0.5,
                         mic_directivity=jnp.asarray(dv.cardioid(aim)))
    st = trace_accumulate(scene, p, IRState.zeros(2048),
                          jax.random.PRNGKey(0), n_rays=8192, max_bounces=2,
                          sample_rate=8000)
    want = np.asarray(st.normalized())
    got = np.asarray(ir.steer(aim))
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=1e-7 * want.max())


def test_steer_rejects_invalid_pattern():
    ir = sp.SpatialIR(w=jnp.ones((1, 4, 1)), x=jnp.zeros((1, 4, 1)),
                      y=jnp.zeros((1, 4, 1)))
    with pytest.raises(ValueError, match="power pattern"):
        ir.steer(0.0, b=2.0, a=1.0)


def test_spatial_params_rejects_existing_mic():
    p = TraceParams.make(np.float32([0.0, 0.0]), np.float32([5.0, 0.0]),
                         mic_directivity=jnp.asarray(dv.cardioid(0.0)))
    with pytest.raises(ValueError, match="mic_directivity"):
        sp.spatial_params(p)


def test_spatial_from_ir_shape_check():
    with pytest.raises(ValueError, match="3L"):
        sp.spatial_from_ir(jnp.zeros((4, 8, 1)))


def test_direct_path_bearing():
    # source at origin seen from (5, 3): bearing atan2(-3, -5)
    scene = far_field()
    ir = run_spatial(scene, (5.0, 3.0))
    w = np.asarray(ir.w)[0, :, 0]
    peak = int(w.argmax())
    assert w[peak] > 0
    ang = float(np.asarray(ir.arrival_angle())[0, peak, 0])
    want = np.arctan2(-3.0, -5.0)
    assert abs(ang - want) < 0.1
    # a single coherent arrival: nearly zero diffuseness at the peak bin
    assert float(np.asarray(ir.diffuseness())[0, peak, 0]) < 0.05


def test_direct_and_echo_bearings_in_one_ir():
    scene = echo_scene()
    ir = run_spatial(scene, (5.0, 0.0))
    ang = np.asarray(ir.arrival_angle())[0, :, 0]
    w = np.asarray(ir.w)[0, :, 0]
    direct_bin = int(np.floor(5.0 / 343.0 * 8000))
    echo_bin = int(np.floor(15.0 / 343.0 * 8000))
    db = slice(max(0, direct_bin - 3), direct_bin + 4)
    eb = slice(echo_bin - 3, echo_bin + 4)
    assert w[db].sum() > 0 and w[eb].sum() > 0
    d_ang = ang[db][w[db].argmax()]
    e_ang = ang[eb][w[eb].argmax()]
    assert abs(abs(d_ang) - np.pi) < 0.1      # direct from -x
    assert abs(e_ang) < 0.1                   # echo from +x


def test_intensity_vector_bounded_by_energy():
    # |(X, Y)| <= W per bin (triangle inequality on the per-hit sums)
    ir = run_spatial(box_room(), (1.0, 0.5), bounces=8, ir_length=4096)
    w = np.asarray(ir.w)
    r = np.sqrt(np.asarray(ir.x) ** 2 + np.asarray(ir.y) ** 2)
    assert np.all(r <= w * (1 + 1e-5) + 1e-12)


def test_late_reverb_more_diffuse_than_direct():
    ir = run_spatial(box_room(), (1.0, 0.5), bounces=12, ir_length=4096,
                     rays=16384)
    w = np.asarray(ir.w)[0, :, 0]
    psi = np.asarray(ir.diffuseness())[0, :, 0]
    peak = int(w.argmax())
    late = w > 0
    late[: peak + 200] = False            # > 25 ms after the direct sound
    assert late.any()
    late_psi = float((psi[late] * w[late]).sum() / w[late].sum())
    assert float(psi[peak]) < 0.1
    assert late_psi > 0.5
    assert late_psi > 4 * max(float(psi[peak]), 1e-3)


def test_stereo_pair_is_steered_cardioids():
    ir = run_spatial(echo_scene(), (5.0, 0.0))
    left, right = ir.stereo(aim=0.0)
    np.testing.assert_allclose(np.asarray(left),
                               np.asarray(ir.steer(np.pi / 4)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(right),
                               np.asarray(ir.steer(-np.pi / 4)), rtol=1e-6)


def test_multi_listener_spatial():
    scene = echo_scene()
    p = TraceParams.make(np.float32([0.0, 0.0]),
                         np.float32([[5.0, 0.0], [2.0, 1.0]]),
                         listener_radius=0.5)
    ir, state = sp.trace_spatial(scene, p, jax.random.PRNGKey(0),
                                 n_rays=4096, max_bounces=2,
                                 sample_rate=8000, ir_length=2048)
    assert ir.w.shape == (2, 2048, 1)
    assert state.sum.shape == (6, 2048, 1)
    # both listeners see the source roughly along -x-ish bearings
    for li, pos in enumerate([(5.0, 0.0), (2.0, 1.0)]):
        w = np.asarray(ir.w)[li, :, 0]
        peak = int(w.argmax())
        ang = float(np.asarray(ir.arrival_angle())[li, peak, 0])
        want = float(np.arctan2(-pos[1], -pos[0]))
        assert abs(ang - want) < 0.15


def test_accumulation_across_calls():
    scene = far_field()
    p = TraceParams.make(np.float32([0.0, 0.0]), np.float32([5.0, 0.0]),
                         listener_radius=0.5)
    ir1, st = sp.trace_spatial(scene, p, jax.random.PRNGKey(0), n_rays=2048,
                               max_bounces=2, sample_rate=8000,
                               ir_length=2048)
    ir2, st = sp.trace_spatial(scene, p, jax.random.PRNGKey(1), n_rays=2048,
                               max_bounces=2, sample_rate=8000,
                               ir_length=2048, state=st)
    assert int(st.frames) == 2
    assert float(np.asarray(ir2.w).sum()) > 0


# ---- binaural (ITD/ILD) decode ---------------------------------------------


def synth_spatial(t0, bearing, energy=1.0, n_t=256, coherent=1.0):
    # one bin of energy at t0 arriving from `bearing`; `coherent` < 1
    # leaves the rest as diffuse energy in the same bin
    w = jnp.zeros((1, n_t, 1)).at[0, t0, 0].set(energy)
    x = w * coherent * np.cos(bearing)
    y = w * coherent * np.sin(bearing)
    return sp.SpatialIR(w=w, x=x, y=y)


def test_binaural_pure_side_itd_and_ild():
    # arrival from the LEFT (facing 0, bearing +pi/2): left ear leads by
    # r/c and gets the 1+shadow gain, right lags by r/c with 1-shadow
    sr, r, c = 8000, 0.0875, 343.0
    shift = r / c * sr                       # 2.04 bins
    s = synth_spatial(100, np.pi / 2)
    left, right = s.binaural(sr, facing=0.0, head_radius=r, shadow=0.6,
                             speed_of_sound=c)
    left, right = np.asarray(left)[0, :, 0], np.asarray(right)[0, :, 0]
    tl = (left * np.arange(left.size)).sum() / left.sum()
    tr = (right * np.arange(right.size)).sum() / right.sum()
    np.testing.assert_allclose(tl, 100 - shift, atol=1e-3)
    np.testing.assert_allclose(tr, 100 + shift, atol=1e-3)
    np.testing.assert_allclose(left.sum(), 1.6, rtol=1e-6)
    np.testing.assert_allclose(right.sum(), 0.4, rtol=1e-6)


def test_binaural_frontal_is_symmetric():
    s = synth_spatial(50, 0.7)              # arrival dead ahead of facing
    left, right = s.binaural(8000, facing=0.7)
    np.testing.assert_allclose(np.asarray(left), np.asarray(right),
                               atol=1e-7)
    # no ITD: all energy stays in the source bin
    assert float(np.asarray(left)[0, 50, 0]) == pytest.approx(1.0)


def random_field(seed=0, n_t=300):
    # random field with |(X,Y)| <= W (part coherent, part diffuse)
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.random((2, n_t, 3)), jnp.float32)
    ang = rng.random((2, n_t, 3)) * 2 * np.pi
    frac = rng.random((2, n_t, 3))
    x = w * frac * np.cos(ang)
    y = w * frac * np.sin(ang)
    return sp.SpatialIR(w=w, x=jnp.asarray(x, jnp.float32),
                        y=jnp.asarray(y, jnp.float32))


def test_binaural_conserves_energy():
    # decorrelation off: left + right == 2 W in total (L1 identity)
    s = random_field()
    left, right = s.binaural(8000, shadow=0.3, decorrelate=False)
    total = float(np.asarray(left).sum() + np.asarray(right).sum())
    np.testing.assert_allclose(
        total, 2 * float(np.asarray(s.w).sum()), rtol=1e-5)


def test_binaural_decorrelation_keeps_coherent_path_bit_identical():
    # the decorrelator touches ONLY the diffuse stream: on a fully
    # coherent field the decorrelated and plain decodes are bit-identical
    s = synth_spatial(100, 0.9, coherent=1.0)
    for on, off in zip(s.binaural(8000, shadow=0.4),
                       s.binaural(8000, shadow=0.4, decorrelate=False)):
        np.testing.assert_array_equal(np.asarray(on), np.asarray(off))
    # and on a mixed field: left(decorr) - signs*diffuse ==
    # left(plain) - diffuse bin-for-bin (the coherent splat is shared)
    from realisticaudioraytracing2d_tpu.spatial import _ear_signs
    m = random_field(seed=3)
    l_on, _ = m.binaural(8000, shadow=0.4)
    l_off, _ = m.binaural(8000, shadow=0.4, decorrelate=False)
    diffuse = np.asarray(m.w) - np.minimum(
        np.hypot(np.asarray(m.x), np.asarray(m.y)), np.asarray(m.w))
    signs = _ear_signs(m.w.shape[1], ear_seed=0)[None, :, None]
    np.testing.assert_allclose(np.asarray(l_on) - signs * diffuse,
                               np.asarray(l_off) - diffuse, atol=1e-6)


def test_binaural_decorrelated_diffuse_conserves_energy_magnitude():
    # the random-sign decorrelator leaves each bin's energy MAGNITUDE
    # exactly in place: |left| of a fully diffuse field == W bin-for-bin,
    # so sum(|left|) + sum(|right|) == 2 W and per-ear power is exact
    m = random_field(seed=4)
    diffuse_only = sp.SpatialIR(w=m.w, x=jnp.zeros_like(m.w),
                                y=jnp.zeros_like(m.w))
    left, right = diffuse_only.binaural(8000, shadow=0.6)
    np.testing.assert_array_equal(np.abs(np.asarray(left)),
                                  np.asarray(m.w))
    np.testing.assert_array_equal(np.abs(np.asarray(right)),
                                  np.asarray(m.w))
    # and the two ears' sign patterns are different (that is the point)
    assert not np.array_equal(np.asarray(left), np.asarray(right))


def test_binaural_decorrelation_drops_late_iacc():
    # fully diffuse late tail (the box-room late field, synthesized as
    # MC-noise on a decaying envelope with x = y = 0): the identical
    # -diffuse-both-ears decode measures IACC ~ 1.0; the velvet
    # decorrelator must push the late-field IACC under 0.5
    from realisticaudioraytracing2d_tpu.analysis import iacc
    sr, n_t = 8000, 2048
    rng = np.random.default_rng(7)
    env = np.exp(-np.arange(n_t) / (0.08 * sr))
    w = jnp.asarray((rng.random(n_t) * env)[None, :, None], jnp.float32)
    s = sp.SpatialIR(w=w, x=jnp.zeros_like(w), y=jnp.zeros_like(w))
    l0, r0 = s.binaural(sr, decorrelate=False)
    l1, r1 = s.binaural(sr)
    late = dict(t_start_s=0.02)
    i0 = float(iacc(jnp.asarray(np.asarray(l0)[0, :, 0]),
                    jnp.asarray(np.asarray(r0)[0, :, 0]), sr, **late))
    i1 = float(iacc(jnp.asarray(np.asarray(l1)[0, :, 0]),
                    jnp.asarray(np.asarray(r1)[0, :, 0]), sr, **late))
    assert i0 > 0.99          # the pre-fix decode: fully coherent
    assert i1 < 0.5           # the decorrelated late field


def test_binaural_traced_box_room_late_iacc():
    # the real thing: traced diffuse box room, late-field IACC of the
    # default binaural decode < 0.5 while the no-decorrelation decode
    # stays interaurally coherent (> 0.9)
    from realisticaudioraytracing2d_tpu.analysis import iacc
    sr = 8000
    s = run_spatial(box_room(), (1.0, 0.5), rays=8192, bounces=12,
                    ir_length=4096, sample_rate=sr)
    l0, r0 = s.binaural(sr, decorrelate=False)
    l1, r1 = s.binaural(sr)
    late = dict(t_start_s=0.08)
    i0 = float(iacc(jnp.asarray(np.asarray(l0)[0, :, 0]),
                    jnp.asarray(np.asarray(r0)[0, :, 0]), sr, **late))
    i1 = float(iacc(jnp.asarray(np.asarray(l1)[0, :, 0]),
                    jnp.asarray(np.asarray(r1)[0, :, 0]), sr, **late))
    assert i0 > 0.9
    assert i1 < 0.5


def test_binaural_degenerate_head_identity():
    # shadow=0 + radius=0 is "no head": coincident ears hear identical
    # signals, so the decode must return W for both ears EXACTLY — the
    # decorrelator (default on) must gate itself off here
    m = random_field(seed=5)
    left, right = m.binaural(8000, head_radius=0.0, shadow=0.0)
    np.testing.assert_allclose(np.asarray(left), np.asarray(m.w),
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(left), np.asarray(right))


def test_binaural_diffuse_part_not_lateralized():
    # half the bin's energy is diffuse: it must split equally and stay
    # at t0 while the coherent half lateralizes
    sr, r, c = 8000, 0.0875, 343.0
    s = synth_spatial(100, np.pi / 2, coherent=0.5)
    left, right = s.binaural(sr, head_radius=r, shadow=1.0,
                             speed_of_sound=c, decorrelate=False)
    right = np.asarray(right)[0, :, 0]
    # right ear: coherent part fully shadowed (gain 0) -> only the
    # diffuse share remains (full, each ear is a whole microphone),
    # undelayed
    np.testing.assert_allclose(right.sum(), 0.5, rtol=1e-6)
    assert right[100] == pytest.approx(0.5)


def test_binaural_traced_echo_lateralizes():
    # face +y: the direct sound (from -x = the listener's LEFT) must
    # lead in the left ear; the wall echo (from +x = RIGHT) must lead in
    # the right ear
    sr = 8000
    s = run_spatial(echo_scene(), (5.0, 0.0), rays=16384, sample_rate=sr)
    left, right = s.binaural(sr, facing=np.pi / 2, head_radius=0.2,
                             shadow=0.6, decorrelate=False)
    left = np.asarray(left)[0, :, 0]
    right = np.asarray(right)[0, :, 0]
    shift = 0.2 / 343.0 * sr                 # 4.7 bins each way
    direct = int(np.floor(5.0 / 343.0 * sr))
    echo = int(np.floor(15.0 / 343.0 * sr))
    win = 24

    def centroid(ir, b):
        seg = ir[b - win:b + win]
        return (seg * np.arange(seg.size)).sum() / seg.sum()

    # left leads (earlier centroid) on the direct arrival...
    assert centroid(right, direct) - centroid(left, direct) > shift
    # ...and lags on the echo
    assert centroid(left, echo) - centroid(right, echo) > shift
    # head shadow: more direct energy in the left ear, echo in the
    # right (windows cover the capture-disc smear, r/c ~ 12 bins early,
    # plus the +-shift bins)
    assert left[direct - win:direct + win].sum() > \
        right[direct - win:direct + win].sum()
    assert right[echo - win:echo + win].sum() > \
        left[echo - win:echo + win].sum()


def test_binaural_near_start_bin_clamps_no_negative_energy():
    # energy in bin 0 arriving from the side: the splat's fractional
    # target is negative there; an unclamped frac used to deposit
    # (1 - frac) > 1 and frac < 0 (a ~20x transient with negative bins)
    sr, r, c = 44100, 0.0875, 343.0
    s = synth_spatial(0, np.pi / 2, n_t=64)
    left, right = s.binaural(sr, head_radius=r, shadow=0.6,
                             speed_of_sound=c)
    left = np.asarray(left)[0, :, 0]
    right = np.asarray(right)[0, :, 0]
    assert (left >= 0).all() and (right >= 0).all()
    # nothing amplified: per-ear totals are exactly the shadowed gains
    np.testing.assert_allclose(left.sum(), 1.6, rtol=1e-6)
    assert left.max() <= 1.6 + 1e-6
    np.testing.assert_allclose(left.sum() + right.sum(), 2.0, rtol=1e-6)


def test_dominant_arrivals_overlapping_windows_keep_bearings():
    # arrival 1 (bearing 0) smears into arrival 2's +-16-bin window;
    # suppression must zero x/y alongside w or the second pick's vector
    # aggregates the first arrival's intensity (wrong bearing/diffuseness)
    n_t = 256
    w = np.zeros((1, n_t, 1), np.float32)
    x = np.zeros_like(w)
    y = np.zeros_like(w)
    w[0, 100, 0] = 1.0
    x[0, 100, 0] = 1.0          # arrival 1 from bearing 0
    w[0, 104, 0] = 0.5
    x[0, 104, 0] = 0.5          # its smear, inside arrival 2's window
    w[0, 120, 0] = 0.8
    x[0, 120, 0] = -0.8         # arrival 2 from bearing pi
    s = sp.SpatialIR(w=jnp.asarray(w), x=jnp.asarray(x), y=jnp.asarray(y))
    arr = sp.dominant_arrivals(s, 8000, n=2, window_bins=16)
    assert len(arr) == 2
    assert abs(arr[0]["bearing_rad"]) < 1e-6
    assert abs(abs(arr[1]["bearing_rad"]) - np.pi) < 1e-6
    assert arr[1]["diffuseness"] < 1e-6
    assert arr[1]["energy"] == pytest.approx(0.8)


# ---- second-order moments (X2/Y2) -------------------------------------------


def test_steer2_matches_retraced_figure_eight():
    # post-hoc second-harmonic steering == actually tracing with the
    # figure-eight mic pattern (exact per-hit identity, like the
    # first-order cardioid test)
    scene = echo_scene()
    aim = 0.6
    p = TraceParams.make(np.float32([0.0, 0.0]), np.float32([5.0, 0.0]),
                         listener_radius=0.5)
    ir, _ = sp.trace_spatial(scene, p, jax.random.PRNGKey(0),
                             n_rays=8192, max_bounces=2,
                             sample_rate=8000, ir_length=2048, order=2)
    pm = TraceParams.make(np.float32([0.0, 0.0]), np.float32([5.0, 0.0]),
                          listener_radius=0.5,
                          mic_directivity=jnp.asarray(
                              dv.figure_eight(aim)))
    st = trace_accumulate(scene, pm, IRState.zeros(2048),
                          jax.random.PRNGKey(0), n_rays=8192,
                          max_bounces=2, sample_rate=8000)
    want = np.asarray(st.normalized())
    got = np.asarray(ir.steer(aim, b=0.0, a=1.0, c=1.0))
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=1e-7 * want.max())


def test_steer2_validates_pattern_and_order():
    ir1, _ = sp.trace_spatial(far_field(),
                              TraceParams.make(np.float32([0.0, 0.0]),
                                               np.float32([5.0, 0.0]),
                                               listener_radius=0.5),
                              jax.random.PRNGKey(0), n_rays=512,
                              max_bounces=1, sample_rate=8000,
                              ir_length=512)
    with pytest.raises(ValueError, match="order=2"):
        ir1.steer(0.0, c=0.5)
    ir2 = sp.SpatialIR(w=jnp.ones((1, 4, 1)), x=jnp.zeros((1, 4, 1)),
                       y=jnp.zeros((1, 4, 1)), x2=jnp.zeros((1, 4, 1)),
                       y2=jnp.zeros((1, 4, 1)))
    with pytest.raises(ValueError, match="negative"):
        ir2.steer(0.0, b=0.0, a=0.5, c=1.0)  # dips below zero at u=pi/2
    # supercardioid-like second-order family is legal
    ir2.steer(0.3, a=1.0, b=4.0 / 3.0, c=1.0 / 3.0)


def test_two_arrival_bearings_exact_moments():
    # two arrivals in one bin: first order smears to the weighted mean
    # bearing; the order-2 solver recovers both
    t1, t2, e1, e2 = 0.3, 2.0, 1.0, 0.7
    n_t = 64
    z = np.zeros((1, n_t, 1), np.float32)
    w = z.copy(); w[0, 10, 0] = e1 + e2
    x = z.copy(); x[0, 10, 0] = e1 * np.cos(t1) + e2 * np.cos(t2)
    y = z.copy(); y[0, 10, 0] = e1 * np.sin(t1) + e2 * np.sin(t2)
    x2 = z.copy(); x2[0, 10, 0] = e1 * np.cos(2 * t1) + e2 * np.cos(2 * t2)
    y2 = z.copy(); y2[0, 10, 0] = e1 * np.sin(2 * t1) + e2 * np.sin(2 * t2)
    s = sp.SpatialIR(*(jnp.asarray(a) for a in (w, x, y, x2, y2)))
    # first order: one bearing strictly between the two, diffuse > 0
    ang = float(np.asarray(s.arrival_angle())[0, 10, 0])
    assert t1 + 0.1 < ang < t2 - 0.1
    assert float(np.asarray(s.diffuseness())[0, 10, 0]) > 0.1
    got = sp.two_arrival_bearings(s, 9, 12)
    (b1, g1), (b2, g2) = got
    assert abs(b1 - t1) < 0.02 and abs(g1 - e1) < 0.02
    assert abs(b2 - t2) < 0.02 and abs(g2 - e2) < 0.02


def test_two_arrival_bearings_traced_image_source():
    # image-source fixture: two specular walls placed so BOTH first
    # reflections arrive at the same instant (path length 15 m) from
    # bearings ~0 (back wall) and ~1.91 rad (top wall). One analysis
    # window holds both: first-order smears them into one intermediate
    # bearing; the second-order solver separates them.
    m = AudioMaterial(absorption=0.1, scattering=0.0, transmission=0.0,
                      ior=1.0)
    h = np.sqrt((15.0 ** 2 - 25.0) / 4.0)        # 7.0711: mirror path 15
    b = SceneBuilder(n_bands=1)
    b.add_segment((10.0, -30.0), (10.0, 30.0), (-1.0, 0.0), m)
    b.add_segment((-30.0, h), (30.0, h), (0.0, -1.0), m)
    scene = b.build()
    sr = 8000
    p = TraceParams.make(np.float32([0.0, 0.0]), np.float32([5.0, 0.0]),
                         listener_radius=0.5)
    ir, _ = sp.trace_spatial(scene, p, jax.random.PRNGKey(3),
                             n_rays=65536, max_bounces=1,
                             sample_rate=sr, ir_length=1024, order=2)
    want1 = 0.0                                   # from +x
    want2 = float(np.arctan2(2 * h, -5.0))        # from the top wall
    echo_bin = int(np.floor(15.0 / 343.0 * sr))   # 349
    lo, hi = echo_bin - 14, echo_bin + 10         # disc smear is early
    # first order: ONE bearing, strictly between the two arrivals
    exw = np.asarray(ir.x)[0, lo:hi, 0].sum()
    eyw = np.asarray(ir.y)[0, lo:hi, 0].sum()
    smeared = float(np.arctan2(eyw, exw))
    assert want1 + 0.25 < smeared < want2 - 0.25
    got = sp.two_arrival_bearings(ir, lo, hi)
    bearings = sorted(bg[0] for bg in got)
    assert abs(bearings[0] - want1) < 0.2, bearings
    assert abs(bearings[1] - want2) < 0.2, bearings
