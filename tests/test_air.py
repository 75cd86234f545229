"""Atmospheric absorption (ops/air.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from realisticaudioraytracing2d_tpu.ops import air


def test_alpha_known_magnitudes():
    # ISO 9613-1 at 20 C / 50% RH / 1 atm, coarse table checks (dB/km):
    # ~1 kHz a few dB/km, ~10 kHz on the order of 100 dB/km.
    a = air.iso9613_alpha([1000.0, 10000.0]) * 1000.0
    assert 3.0 < a[0] < 8.0
    assert 80.0 < a[1] < 250.0


def test_alpha_monotonic_in_audible_range():
    f = np.geomspace(50, 20000, 64)
    a = air.iso9613_alpha(f)
    assert np.all(a > 0)
    assert np.all(np.diff(a) > 0)


def test_alpha_low_freq_f_squared_scaling():
    # Below both relaxation frequencies alpha ~ f^2.
    a = air.iso9613_alpha([50.0, 100.0])
    assert a[1] / a[0] == pytest.approx(4.0, rel=0.15)


def test_alpha_humidity_effect_at_high_freq():
    # Dry air absorbs MORE at high frequency (O2 relaxation starved of
    # water vapor moves f_rO down toward the signal band).
    dry = float(air.iso9613_alpha(4000.0, rel_humidity=10.0))
    humid = float(air.iso9613_alpha(4000.0, rel_humidity=80.0))
    assert dry > humid


def test_band_frequencies():
    f1 = air.band_frequencies(1)
    assert f1.shape == (1,) and 1000 < f1[0] < 2000
    f8 = air.band_frequencies(8)
    assert f8[0] == pytest.approx(125.0) and f8[-1] == pytest.approx(16000.0)
    assert np.all(np.diff(np.log(f8)) > 0)


def test_apply_air_absorption_exact_factors():
    sr, c = 1000, 343.0
    ir = jnp.ones((1, 4, 2))                       # [L, T, K]
    alpha = jnp.asarray([0.1, 1.0])                # dB/m per band
    out = np.asarray(air.apply_air_absorption(ir, sr, alpha, c))
    t = np.arange(4) / sr
    for k, a in enumerate([0.1, 1.0]):
        np.testing.assert_allclose(out[0, :, k],
                                   10.0 ** (-a * c * t / 10.0), rtol=1e-5)


def test_apply_air_absorption_linear_in_ir():
    # Post-pass on the accumulated sum == post-pass on the normalized IR.
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.random((2, 64, 3)), jnp.float32)
    a = air.iso9613_alpha(air.band_frequencies(3))
    out1 = np.asarray(air.apply_air_absorption(ir * 8.0, 8000, a)) / 8.0
    out2 = np.asarray(air.apply_air_absorption(ir, 8000, a))
    np.testing.assert_allclose(out1, out2, rtol=1e-5)


def test_apply_air_band_mismatch_raises():
    with pytest.raises(ValueError):
        air.apply_air_absorption(jnp.ones((1, 8, 3)), 8000, [0.1, 0.2])


def test_air_shortens_rt60_on_traced_ir():
    import jax
    from realisticaudioraytracing2d_tpu import analysis
    from realisticaudioraytracing2d_tpu.config import smoll_room_config
    from realisticaudioraytracing2d_tpu.engine import Engine
    from realisticaudioraytracing2d_tpu.models.rooms import smoll_room

    room = smoll_room()
    cfg = smoll_room_config(ray_count=2000)
    eng = Engine(room.scene, cfg)
    state = eng.trace_frames(eng.params(room.source, room.listener),
                             jax.random.PRNGKey(0), n_frames=4)
    ir = state.normalized()
    # Exaggerated absorption so the effect dominates Monte-Carlo noise.
    wet = air.apply_air_absorption(ir, cfg.audio.sample_rate, 0.5)
    rt_dry = float(analysis.rt60_t20(jnp.moveaxis(ir, 1, -1),
                                     cfg.audio.sample_rate)[0, 0])
    rt_wet = float(analysis.rt60_t20(jnp.moveaxis(wet, 1, -1),
                                     cfg.audio.sample_rate)[0, 0])
    assert rt_wet < rt_dry
