"""Convolution of dry audio with impulse responses.

The reference convolves on the GPU with a direct O(N*M) kernel, one thread
per output sample (``Assets/Script/AudioConvolve.compute:13-31``). Here the
production path is FFT convolution (O((N+M) log(N+M)), XLA-native ``rfft``)
with the direct form retained as a parity oracle, including the reference's
two quirks:

* input samples with ``|x| <= eps`` (1e-4) are skipped entirely
  (``AudioConvolve.compute:25``) — a denormal guard that audibly gates very
  quiet passages; reproduced behind ``gate_eps``;
* the output is ``InputLength + IRLength`` samples — one *more* than the
  true full-convolution length N+M-1 (the trailing sample is always 0);
* the IR is normalized by the Monte-Carlo frame count at convolution time
  (``AudioConvolve.compute:30``).

For streaming, :func:`convolve_chunk_crossfade` convolves one chunk against
the previous and current IR simultaneously (batched FFT) and linearly
crossfades — the improvement over the reference's hard IR switch that
BASELINE.json's north-star calls for.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .geometry import EPS


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def gate_input(x: jax.Array, eps: float = EPS) -> jax.Array:
    """The reference's ``|x| <= eps -> skip`` input gate."""
    return jnp.where(jnp.abs(x) > eps, x, 0.0)


def convolve_direct(x: jax.Array, ir: jax.Array,
                    accum_count: jax.Array | int = 1,
                    gate_eps: Optional[float] = EPS) -> jax.Array:
    """Direct full convolution, reference-parity oracle.

    ``out[n] = sum_k x[k] * ir[n-k] / accum_count`` with output length
    ``len(x) + len(ir)`` (``AudioConvolve.compute:14-31``).
    """
    if gate_eps is not None:
        x = gate_input(x, gate_eps)
    # precision=HIGHEST: parity oracle must be true f32, not a fast
    # low-precision conv algorithm.
    full = jnp.convolve(x, ir,
                        precision=jax.lax.Precision.HIGHEST)  # length N+M-1
    full = jnp.pad(full, (0, 1))                    # reference length N+M
    acc = jnp.maximum(1, jnp.asarray(accum_count)).astype(jnp.float32)
    return full / acc


@partial(jax.jit, static_argnames=("out_length",))
def _fft_conv(x: jax.Array, ir: jax.Array, out_length: int) -> jax.Array:
    n_fft = _next_pow2(out_length)
    X = jnp.fft.rfft(x, n_fft)
    H = jnp.fft.rfft(ir, n_fft)
    y = jnp.fft.irfft(X * H, n_fft)
    return y[..., :out_length]


def convolve_fft(x: jax.Array, ir: jax.Array,
                 accum_count: jax.Array | int = 1,
                 gate_eps: Optional[float] = EPS) -> jax.Array:
    """FFT full convolution, numerically equivalent to
    :func:`convolve_direct` (same length, gating and normalization)."""
    if gate_eps is not None:
        x = gate_input(x, gate_eps)
    out_length = x.shape[-1] + ir.shape[-1]
    y = _fft_conv(x, ir, out_length)
    acc = jnp.maximum(1, jnp.asarray(accum_count)).astype(jnp.float32)
    return y / acc


def convolve_chunk_crossfade(chunk: jax.Array, ir_prev: jax.Array,
                             ir_cur: jax.Array,
                             accum_prev: jax.Array | int,
                             accum_cur: jax.Array | int,
                             gate_eps: Optional[float] = EPS) -> jax.Array:
    """Convolve one streaming chunk against two successive IRs and
    linearly crossfade from the previous to the current across the chunk.

    The reverb tail (everything past the chunk length) uses the current IR
    only, so successive chunks overlap-add coherently. Both convolutions
    share one FFT of the chunk (batched multiply) — two IRs cost one extra
    pointwise product, not a second pipeline.
    """
    if gate_eps is not None:
        chunk = gate_input(chunk, gate_eps)
    n = chunk.shape[-1]
    m = ir_prev.shape[-1]
    out_length = n + m
    irs = jnp.stack([ir_prev, ir_cur])               # [2, M]
    accs = jnp.stack([jnp.maximum(1, jnp.asarray(accum_prev)),
                      jnp.maximum(1, jnp.asarray(accum_cur))]
                     ).astype(jnp.float32)
    ys = _fft_conv(chunk[None, :], irs, out_length) / accs[:, None]  # [2, T]
    ramp = jnp.minimum(jnp.arange(out_length, dtype=jnp.float32) /
                       jnp.maximum(1, n), 1.0)
    return ys[0] * (1.0 - ramp) + ys[1] * ramp


def peak_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Peak normalization as in the legacy offline bake's ``PlayResult``
    (``RayTraceManagerComplex.cs:228-245``)."""
    peak = jnp.max(jnp.abs(x))
    return x / jnp.maximum(peak, eps)


# ---------------------------------------------------------------------------
# Sample-rate conversion / channel downmix (LoadSample parity,
# RayTraceManager.cs:135-167)
# ---------------------------------------------------------------------------

def downmix_mono(x: jax.Array) -> jax.Array:
    """Average interleaved-as-[samples, channels] audio to mono
    (``RayTraceManager.cs:141-147``)."""
    if x.ndim == 1:
        return x
    return jnp.mean(x, axis=-1)


def resample_linear(x: jax.Array, src_rate: int, dst_rate: int) -> jax.Array:
    """Linear-interpolation resampling, bit-matching the reference
    (``RayTraceManager.cs:149-166``): ``ratio = src/dst``,
    ``newLength = round(N / ratio)``, sample i reads ``lerp(x[floor(s)],
    x[min(floor(s)+1, N-1)], frac(s))`` at ``s = i * ratio``."""
    if src_rate == dst_rate:
        return x
    n = x.shape[-1]
    ratio = src_rate / dst_rate
    new_length = int(round(n / ratio))
    src_idx = jnp.arange(new_length, dtype=jnp.float32) * ratio
    i0 = jnp.floor(src_idx).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    t = src_idx - i0.astype(jnp.float32)
    return x[i0] * (1.0 - t) + x[i1] * t


def load_samples(x: jax.Array, src_rate: int, dst_rate: int) -> jax.Array:
    """Full ``LoadSample`` pipeline: mono downmix then linear resample."""
    return resample_linear(downmix_mono(x), src_rate, dst_rate)


# ---------------------------------------------------------------------------
# Banded synthesis: wet audio from a frequency-banded IR
# ---------------------------------------------------------------------------

def combined_transfer(ir: jax.Array, n_fft: int) -> jax.Array:
    """Collapse a banded IR ``[..., T, K]`` into a single rfft-domain
    transfer function ``[..., F]``: ``H = sum_k mask_k * rfft(ir[..., k])``.

    Because the band masks partition the spectrum, convolving each
    band-filtered input with its band IR and summing equals a single
    convolution with this combined transfer function — one irfft instead
    of K. For K == 1 this is just ``rfft(ir)``.
    """
    k = ir.shape[-1]
    h = jnp.fft.rfft(jnp.moveaxis(ir, -1, -2), n_fft)     # [..., K, F]
    if k == 1:
        return h[..., 0, :]
    masks = band_filterbank(ir.shape[-2], k, n_fft)       # [K, F]
    return jnp.sum(h * masks, axis=-2)


def apply_ir(x: jax.Array, ir: jax.Array,
             accum_count: jax.Array | int = 1,
             gate_eps: Optional[float] = EPS) -> jax.Array:
    """Convolve mono input ``x[N]`` with an IR of shape ``[T]``, ``[T, K]``
    (banded) or ``[L, T, K]`` (multi-listener banded). Returns wet audio of
    shape ``[N+T]`` or ``[L, N+T]``. The general entry point used by the
    bake and streaming engines."""
    if gate_eps is not None:
        x = gate_input(x, gate_eps)
    squeeze = ir.ndim == 1
    if squeeze:
        ir = ir[:, None]
    t = ir.shape[-2]
    out_length = x.shape[-1] + t
    n_fft = _next_pow2(out_length)
    h = combined_transfer(ir, n_fft)                      # [..., F]
    y = jnp.fft.irfft(jnp.fft.rfft(x, n_fft) * h, n_fft)[..., :out_length]
    acc = jnp.maximum(1, jnp.asarray(accum_count)).astype(jnp.float32)
    y = y / acc
    return y[0] if (squeeze and y.ndim > 1) else y


def band_filterbank(n_samples: int, n_bands: int, n_fft: int) -> jax.Array:
    """Brickwall rfft-domain masks splitting [0, nyquist] into ``n_bands``
    equal bands. Returns [n_bands, n_fft//2 + 1] float32."""
    n_bins = n_fft // 2 + 1
    band_of_bin = jnp.minimum(
        (jnp.arange(n_bins) * n_bands) // n_bins, n_bands - 1)
    return (band_of_bin[None, :] ==
            jnp.arange(n_bands)[:, None]).astype(jnp.float32)


def convolve_banded(x: jax.Array, ir_banded: jax.Array,
                    accum_count: jax.Array | int = 1,
                    gate_eps: Optional[float] = EPS) -> jax.Array:
    """Wet audio from a banded IR ``[T, K]``: split the dry signal into K
    frequency bands (zero-phase brickwall filterbank), convolve band k with
    IR band k, and sum.

    This completes what the legacy frequency-binned pipeline sketched but
    never wired up (its FFT kernels are never dispatched —
    ``RaytraceOcclusion2D.compute:329-425``, SURVEY.md section 2.1).
    """
    if gate_eps is not None:
        x = gate_input(x, gate_eps)
    t_ir, k = ir_banded.shape
    out_length = x.shape[-1] + t_ir
    n_fft = _next_pow2(out_length)
    X = jnp.fft.rfft(x, n_fft)                       # [F]
    masks = band_filterbank(x.shape[-1], k, n_fft)   # [K, F]
    H = jnp.fft.rfft(ir_banded.T, n_fft)             # [K, F]
    y = jnp.fft.irfft(X[None, :] * masks * H, n_fft)  # [K, n_fft]
    y = jnp.sum(y, axis=0)[:out_length]
    acc = jnp.maximum(1, jnp.asarray(accum_count)).astype(jnp.float32)
    return y / acc
