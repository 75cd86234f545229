"""Legacy frequency-binned pipeline parity.

The reference ships an older kernel suite (``RaytraceOcclusion2D.compute``)
and a synchronous orchestrator (``RayTraceManagerComplex.cs``) whose IR is
**time x frequency binned**: hits carry a ``muffleFactor`` (placeholder
``1 - energy``, ``RaytraceOcclusion2D.compute:125-127``) and ``ProcessHits``
spreads each hit across ``WindowSize`` (=128) frequency slots with
``exp(-muffle * freq * MuffleScale / WindowSize)`` attenuation at time bin
``timeDelay * SampleRate / WindowSize`` (``:234-252``). Its radix-2
FFT/IFFT kernels are present but never dispatched (``:329-425``).

This module reproduces that pipeline functionally on top of the modern
trace (which supersedes it via true per-material banded absorption —
``ops/trace.py``): scalar hits -> muffled banded IR -> spectrogram raster
-> offline bake. The FFT/IFFT the legacy kernels sketched is
``jnp.fft.rfft/irfft`` (XLA-native).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ir import muffle_band_energies
from .trace import Hits

DEFAULT_WINDOW_SIZE = 128   # RayTraceManagerComplex.cs:27
DEFAULT_MUFFLE_SCALE = 5.0  # RayTraceManagerComplex.cs:28


def hit_muffle_factors(hits: Hits) -> jax.Array:
    """The legacy placeholder muffle model: ``muffle = 1 - energy``
    (``RaytraceOcclusion2D.compute:126``), using the scalar (band-0)
    energy. Shape [B, 2, R, L]."""
    return 1.0 - hits.energy[..., 0]


def scatter_hits_legacy(hits: Hits, sample_rate: int, n_time_bins: int,
                        window_size: int = DEFAULT_WINDOW_SIZE,
                        muffle_scale: float = DEFAULT_MUFFLE_SCALE
                        ) -> jax.Array:
    """Build the legacy time x frequency IR ``[L, n_time_bins, window_size]``.

    Time bin = ``floor(delay * sample_rate / window_size)``; each hit's
    energy spreads across the ``window_size`` frequency slots with the
    exponential high-frequency muffle (``RaytraceOcclusion2D.compute:
    241-249``), deterministically scatter-added.
    """
    b, s, r, l = hits.valid.shape
    n = b * s * r
    delay = jnp.moveaxis(hits.delay, -1, 0).reshape(l, n)
    valid = jnp.moveaxis(hits.valid, -1, 0).reshape(l, n)
    energy = jnp.moveaxis(hits.energy[..., 0], -1, 0).reshape(l, n)
    muffle = jnp.moveaxis(hit_muffle_factors(hits), -1, 0).reshape(l, n)

    bins = jnp.floor(delay * sample_rate / window_size).astype(jnp.int32)
    ok = valid & (bins >= 0) & (bins < n_time_bins)
    bins = jnp.where(ok, bins, n_time_bins)
    banded = muffle_band_energies(energy, muffle, window_size,
                                  muffle_scale)          # [L, N, W]
    banded = banded * ok[..., None].astype(banded.dtype)

    def one_listener(bins_l, banded_l):
        ir = jnp.zeros((n_time_bins + 1, window_size), jnp.float32)
        return ir.at[bins_l].add(banded_l)[:n_time_bins]

    return jax.vmap(one_listener)(bins, banded)


class LegacyIRState(NamedTuple):
    """Accumulated legacy spectro-IR + frame counter (single mutable buffer
    in the reference; explicit state here)."""

    sum: jax.Array     # [L, T_bins, window]
    frames: jax.Array  # scalar int32

    @staticmethod
    def zeros(n_time_bins: int, n_listeners: int = 1,
              window_size: int = DEFAULT_WINDOW_SIZE) -> "LegacyIRState":
        return LegacyIRState(
            sum=jnp.zeros((n_listeners, n_time_bins, window_size),
                          jnp.float32),
            frames=jnp.zeros((), jnp.int32))

    def normalized(self) -> jax.Array:
        return self.sum / jnp.maximum(1, self.frames).astype(jnp.float32)


def accumulate_legacy(state: LegacyIRState, hits: Hits, sample_rate: int,
                      muffle_scale: float = DEFAULT_MUFFLE_SCALE
                      ) -> LegacyIRState:
    ir = scatter_hits_legacy(hits, sample_rate, state.sum.shape[-2],
                             state.sum.shape[-1], muffle_scale)
    return LegacyIRState(sum=state.sum + ir, frames=state.frames + 1)


def legacy_ir_to_time_domain(spectro_ir: jax.Array,
                             sample_rate: int,
                             ir_length: int,
                             window_size: int = DEFAULT_WINDOW_SIZE
                             ) -> jax.Array:
    """Render the legacy time x frequency IR back to a time-domain IR of
    ``ir_length`` samples for convolution: each time bin contributes a
    windowed burst whose spectrum follows its band energies (irfft of the
    per-bin band amplitudes — the role the never-dispatched legacy IFFT
    kernel was sketched for)."""
    l, t_bins, w = spectro_ir.shape
    # irfft over the band axis: [L, T_bins, 2*(W-1)] time-domain bursts
    bursts = jnp.fft.irfft(spectro_ir.astype(jnp.complex64), axis=-1)
    burst_len = bursts.shape[-1]
    # overlap-add bursts at their time-bin offsets
    offsets = jnp.arange(t_bins) * window_size
    idx = offsets[:, None] + jnp.arange(burst_len)[None, :]  # [T_bins, BL]
    flat_idx = jnp.clip(idx, 0, ir_length + burst_len - 1).reshape(-1)

    def one_listener(bl):
        out = jnp.zeros((ir_length + burst_len,), jnp.float32)
        return out.at[flat_idx].add(bl.reshape(-1))[:ir_length]

    return jax.vmap(one_listener)(bursts)
