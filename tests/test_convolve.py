"""Convolution tests: reference-kernel oracle parity, FFT==direct, banded."""

import jax.numpy as jnp
import numpy as np
import pytest

from realisticaudioraytracing2d_tpu.ops import convolve as cv


def oracle_audio_convolve(x, ir, accum, eps=1e-4):
    """float64 port of AudioConvolve.compute:13-31 (incl. eps input gate
    and N+M output length)."""
    n_out = len(x) + len(ir)
    out = np.zeros(n_out)
    for n in range(n_out):
        s = 0.0
        for k in range(max(0, n - len(ir) + 1), min(n, len(x) - 1) + 1):
            if abs(x[k]) > eps:
                s += x[k] * ir[n - k]
        out[n] = s / accum if accum > 0 else 0.0
    return out


def test_direct_matches_reference_oracle(rng):
    x = rng.uniform(-1, 1, 37).astype(np.float32)
    x[5] = 5e-5  # below the eps gate — must be skipped
    ir = rng.uniform(0, 0.5, 23).astype(np.float32)
    got = np.asarray(cv.convolve_direct(jnp.asarray(x), jnp.asarray(ir),
                                        accum_count=3))
    want = oracle_audio_convolve(x, ir, 3)
    assert got.shape == (37 + 23,)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_fft_equals_direct(rng):
    x = rng.uniform(-1, 1, 300).astype(np.float32)
    ir = rng.uniform(-0.2, 0.5, 150).astype(np.float32)
    d = np.asarray(cv.convolve_direct(jnp.asarray(x), jnp.asarray(ir),
                                      accum_count=2, gate_eps=None))
    f = np.asarray(cv.convolve_fft(jnp.asarray(x), jnp.asarray(ir),
                                   accum_count=2, gate_eps=None))
    np.testing.assert_allclose(f, d, rtol=1e-3, atol=1e-4)


def test_fft_applies_gate_like_direct(rng):
    x = rng.uniform(-1, 1, 64).astype(np.float32)
    x[::3] = 1e-5
    ir = rng.uniform(0, 1, 32).astype(np.float32)
    d = np.asarray(cv.convolve_direct(jnp.asarray(x), jnp.asarray(ir)))
    f = np.asarray(cv.convolve_fft(jnp.asarray(x), jnp.asarray(ir)))
    np.testing.assert_allclose(f, d, rtol=1e-3, atol=1e-4)


def test_accum_normalization():
    x = jnp.asarray([1.0])
    ir = jnp.asarray([4.0, 2.0])
    out = np.asarray(cv.convolve_direct(x, ir, accum_count=4))
    np.testing.assert_allclose(out, [1.0, 0.5, 0.0], atol=1e-6)


def test_crossfade_identical_irs_is_identity(rng):
    # Crossfading between two equal IRs must equal a plain convolution.
    x = rng.uniform(-1, 1, 128).astype(np.float32)
    ir = rng.uniform(0, 0.3, 64).astype(np.float32)
    plain = np.asarray(cv.convolve_fft(jnp.asarray(x), jnp.asarray(ir),
                                       accum_count=2))
    xf = np.asarray(cv.convolve_chunk_crossfade(
        jnp.asarray(x), jnp.asarray(ir), jnp.asarray(ir), 2, 2))
    np.testing.assert_allclose(xf, plain, rtol=1e-3, atol=1e-5)


def test_crossfade_endpoints(rng):
    # At sample 0 the output equals the prev-IR convolution; past the chunk
    # length it equals the cur-IR convolution (the tail uses only ir_cur).
    x = rng.uniform(0.5, 1, 64).astype(np.float32)
    ir1 = np.zeros(32, np.float32)
    ir1[0] = 1.0
    ir2 = np.zeros(32, np.float32)
    ir2[0] = 2.0
    out = np.asarray(cv.convolve_chunk_crossfade(
        jnp.asarray(x), jnp.asarray(ir1), jnp.asarray(ir2), 1, 1))
    assert out[0] == pytest.approx(x[0], rel=1e-4)
    tail = np.asarray(cv.convolve_fft(jnp.asarray(x), jnp.asarray(ir2)))
    np.testing.assert_allclose(out[64:], tail[64:], rtol=1e-3, atol=1e-5)


def test_peak_normalize():
    x = jnp.asarray([0.1, -0.5, 0.2])
    out = np.asarray(cv.peak_normalize(x))
    assert np.abs(out).max() == pytest.approx(1.0)


# --- LoadSample parity (RayTraceManager.cs:135-167) ------------------------

def test_downmix_mono():
    x = jnp.asarray([[1.0, 3.0], [2.0, 4.0]])
    np.testing.assert_allclose(np.asarray(cv.downmix_mono(x)), [2.0, 3.0])


def test_resample_identity():
    x = jnp.arange(10, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(cv.resample_linear(x, 48000,
                                                                48000)),
                                  np.asarray(x))


def test_resample_linear_oracle():
    # Port of the C# loop for 44100 -> 48000.
    x = np.sin(np.arange(200) * 0.1).astype(np.float32)
    src, dst = 44100, 48000
    got = np.asarray(cv.resample_linear(jnp.asarray(x), src, dst))
    ratio = src / dst
    new_len = int(round(len(x) / ratio))
    assert got.shape == (new_len,)
    for i in [0, 1, 57, new_len - 1]:
        s = i * ratio
        i0 = int(np.floor(s))
        i1 = min(i0 + 1, len(x) - 1)
        t = s - i0
        want = x[i0] * (1 - t) + x[i1] * t
        assert got[i] == pytest.approx(want, abs=1e-5)


def test_resample_downsample_length():
    x = jnp.ones(480, jnp.float32)
    out = cv.resample_linear(x, 48000, 16000)
    assert out.shape == (160,)


# --- banded synthesis -------------------------------------------------------

def test_band_filterbank_partitions_unity():
    masks = np.asarray(cv.band_filterbank(256, 4, 256))
    assert masks.shape == (4, 129)
    np.testing.assert_allclose(masks.sum(0), np.ones(129))


def test_convolve_banded_flat_ir_equals_scalar(rng):
    # If all K bands share the same IR, banded synthesis == plain FFT conv.
    x = rng.uniform(-1, 1, 200).astype(np.float32)
    ir = rng.uniform(0, 0.3, 100).astype(np.float32)
    banded = jnp.tile(jnp.asarray(ir)[:, None], (1, 4))
    got = np.asarray(cv.convolve_banded(jnp.asarray(x), banded,
                                        accum_count=1, gate_eps=None))
    want = np.asarray(cv.convolve_fft(jnp.asarray(x), jnp.asarray(ir),
                                      accum_count=1, gate_eps=None))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_convolve_banded_highband_removes_lows(rng):
    # IR with energy only in the top band: a pure low-frequency input should
    # come out strongly attenuated vs a flat IR.
    n = 512
    t = np.arange(n)
    x = np.sin(2 * np.pi * t * 2 / n).astype(np.float32)  # very low freq
    ir_hi = np.zeros((64, 4), np.float32)
    ir_hi[0, 3] = 1.0
    ir_flat = np.zeros((64, 4), np.float32)
    ir_flat[0, :] = 1.0
    out_hi = np.asarray(cv.convolve_banded(jnp.asarray(x),
                                           jnp.asarray(ir_hi),
                                           gate_eps=None))
    out_flat = np.asarray(cv.convolve_banded(jnp.asarray(x),
                                             jnp.asarray(ir_flat),
                                             gate_eps=None))
    assert np.abs(out_hi).max() < 0.1 * np.abs(out_flat).max()
