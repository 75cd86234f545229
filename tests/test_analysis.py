"""Room-acoustics metrics (analysis.py).

Synthetic exponential energy decays have closed-form metrics, so every
estimator is checked against an analytic oracle; the integration test
runs the real trace on SmollRoom and sanity-checks the derived numbers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from realisticaudioraytracing2d_tpu import analysis

SR = 48000


def exp_ir(t60: float, length: int, sr: int = SR, start: int = 0):
    """Energy IR decaying 60 dB in ``t60`` seconds, first arrival at
    bin ``start``."""
    t = np.arange(length, dtype=np.float64) / sr
    ir = 10.0 ** (-6.0 * t / t60)
    ir = np.roll(ir, start)
    ir[:start] = 0.0
    return jnp.asarray(ir, jnp.float32)


def test_edc_is_reverse_cumsum():
    ir = jnp.asarray([1.0, 0.5, 0.25, 0.0])
    np.testing.assert_allclose(np.asarray(analysis.schroeder_edc(ir)),
                               [1.75, 0.75, 0.25, 0.0], rtol=1e-6)


def test_edc_db_starts_at_zero_and_decays():
    db = np.asarray(analysis.edc_db(exp_ir(0.5, SR)))
    assert db[0] == pytest.approx(0.0, abs=1e-5)
    assert np.all(np.diff(db) <= 1e-6)


@pytest.mark.parametrize("t60", [0.3, 0.8, 1.5])
@pytest.mark.parametrize("fn", [analysis.rt60_t20, analysis.rt60_t30,
                                analysis.early_decay_time])
def test_decay_times_recover_exponential(t60, fn):
    # EDC of an exponential decays at the same rate as the IR, so every
    # fit window returns the true T60. IR long enough to span -35 dB.
    ir = exp_ir(t60, int(SR * t60))
    est = float(fn(ir, SR))
    assert est == pytest.approx(t60, rel=0.01)


def test_decay_time_nan_when_window_unreached():
    # 10-ms IR of a 1-s decay never reaches -25 dB -> NaN, not garbage.
    ir = exp_ir(1.0, SR // 100)
    assert np.isnan(float(analysis.rt60_t20(ir, SR)))


def test_clarity_definition_against_numpy_oracle():
    ir = np.asarray(exp_ir(0.6, SR), np.float64)
    split = int(round(50e-3 * SR))  # direct arrival at bin 0
    early, late = ir[:split].sum(), ir[split:].sum()
    c50 = float(analysis.clarity(jnp.asarray(ir, jnp.float32), SR, 50.0))
    d50 = float(analysis.definition(jnp.asarray(ir, jnp.float32), SR, 50.0))
    assert c50 == pytest.approx(10 * np.log10(early / late), abs=1e-3)
    assert d50 == pytest.approx(early / (early + late), abs=1e-5)


def test_split_measured_from_direct_arrival():
    # Shifting the whole IR later must not change C50/D50: the split
    # follows the first arrival.
    a = exp_ir(0.6, SR)
    b = exp_ir(0.6, SR, start=480)  # +10 ms
    for fn in (analysis.clarity, analysis.definition):
        assert float(fn(a, SR)) == pytest.approx(float(fn(b, SR)), rel=1e-3)


def test_centre_time_oracle():
    ir = np.zeros(1000)
    ir[100] = 2.0
    ir[500] = 1.0
    ts = float(analysis.centre_time(jnp.asarray(ir, jnp.float32), SR))
    assert ts == pytest.approx((2 * 100 + 1 * 500) / 3 / SR, rel=1e-5)


def test_direct_arrival_ignores_weak_precursor():
    ir = np.zeros(1000, np.float32)
    ir[50] = 1e-5   # stray low-energy deposit
    ir[200] = 1.0   # the real direct sound
    assert int(analysis.direct_arrival_bin(jnp.asarray(ir))) == 200
    t = float(analysis.direct_arrival_time(jnp.asarray(ir), SR))
    assert t == pytest.approx(200 / SR)


def test_analyze_ir_shapes():
    ir1 = exp_ir(0.4, SR // 2)
    out1 = analysis.analyze_ir(ir1, SR)
    assert out1["rt60_t20_s"].shape == ()
    ir2 = jnp.stack([ir1, ir1 * 0.5], axis=-1)            # [T, K=2]
    out2 = analysis.analyze_ir(ir2, SR)
    assert out2["d50"].shape == (2,)
    ir3 = jnp.stack([ir2, ir2])                           # [L=2, T, K=2]
    out3 = analysis.analyze_ir(ir3, SR)
    assert out3["c80_db"].shape == (2, 2)
    # Scaling the IR is metric-invariant (all are energy ratios/times).
    out_scaled = analysis.analyze_ir(ir1 * 37.0, SR)
    assert out_scaled["rt60_t30_s"] == pytest.approx(
        float(out1["rt60_t30_s"]), rel=1e-5)


def test_analyze_traced_smoll_room():
    import jax
    from realisticaudioraytracing2d_tpu.config import smoll_room_config
    from realisticaudioraytracing2d_tpu.engine import Engine
    from realisticaudioraytracing2d_tpu.models.rooms import smoll_room

    room = smoll_room()
    cfg = smoll_room_config(ray_count=2000)
    eng = Engine(room.scene, cfg)
    state = eng.trace_frames(eng.params(room.source, room.listener),
                             jax.random.PRNGKey(0), n_frames=4)
    out = analysis.analyze_ir(state.normalized(), cfg.audio.sample_rate)
    rt = float(out["rt60_t20_s"][0, 0])
    assert 0.01 < rt < cfg.audio.reverb_duration  # finite, in range
    assert 0.0 <= float(out["d50"][0, 0]) <= 1.0
    # SmollRoom quirk: the source sits behind the transmissive slant
    # wall, so the first arrival is a through-wall path — still roughly
    # the geometric distance over c.
    dist = float(np.linalg.norm(np.asarray(room.source)
                                - np.asarray(room.listener)))
    d_est = float(out["direct_distance_m"][0, 0])
    assert d_est == pytest.approx(dist, rel=0.25)


def test_analyze_dataset_matches_per_ir():
    rng = np.random.default_rng(1)
    t60s = [0.3, 0.7]
    irs = np.stack([np.asarray(exp_ir(t, 8000, sr=8000)) for t in t60s])
    irs = irs[:, None, :, None]                      # [rooms, L=1, T, K=1]
    out = analysis.analyze_dataset(irs, 8000)
    assert out["rt60_t20_s"].shape == (2, 1, 1)
    for i, t in enumerate(t60s):
        assert out["rt60_t20_s"][i, 0, 0] == pytest.approx(t, rel=0.01)
        single = analysis.analyze_ir(irs[i], 8000)
        assert out["c50_db"][i, 0, 0] == pytest.approx(
            float(single["c50_db"][0, 0]), abs=1e-4)
