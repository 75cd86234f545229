"""Room-acoustics metrics from traced impulse responses.

The reference offers no analysis of the IRs it builds — its only
"metrics" are the on-screen waveform raster and commented-out max/avg
energy printouts (``RayTraceManagerComplex.cs:214-224``). A framework
user doing acoustics work needs the standard ISO 3382-style room
parameters, so this module derives them from the traced IR:

* **EDC** — Schroeder backward-integrated energy-decay curve.
* **RT60** (via T20/T30) and **EDT** — reverberation / early decay time
  from a least-squares line fit on the dB decay.
* **C50/C80 clarity**, **D50 definition**, **centre time** — the
  early/late energy-balance parameters.
* **direct arrival** — first-arrival time (and implied path length).

One physical note: the trace deposits *energy* per bin (``ProcessHits``
sums ``rayInfo.energy``, ``Raytrace2D.compute:164`` — there is no sign or
phase), so these IRs are already energy-time curves. Schroeder
integration therefore skips the usual squaring step: the EDC is a plain
reversed cumulative sum of the bins.

All functions are pure jnp over ``[..., T]`` arrays (time last) and are
jit/vmap-compatible: band and listener axes ride along as leading batch
dims. :func:`analyze_ir` wraps them for the framework's ``[L, T, K]``
layout and returns a plain dict of numpy arrays for reporting.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

# Energy floor for dB conversions: well under any real deposit but large
# enough to keep log10 finite on empty tails.
_EDC_FLOOR = 1e-30


def schroeder_edc(ir: jnp.ndarray) -> jnp.ndarray:
    """Schroeder energy-decay curve of an energy IR ``[..., T]``.

    ``edc[t] = sum_{u >= t} ir[u]`` — the remaining (not yet decayed)
    energy at each instant. No squaring: the trace's IR bins are already
    energies (see module docstring).
    """
    return jnp.cumsum(ir[..., ::-1], axis=-1)[..., ::-1]


def edc_db(ir: jnp.ndarray) -> jnp.ndarray:
    """EDC normalized to its initial value, in dB: 0 at t=0, falling.

    The *normalized ratio* is floored (not just the raw EDC): for
    gain-scaled IRs ``edc / total`` can underflow float32 to exactly 0
    at the tail, and a -inf dB there poisons every downstream masked
    sum (``0 * -inf = nan`` in :func:`_fit_decay_slope`)."""
    edc = schroeder_edc(ir)
    total = jnp.maximum(edc[..., :1], _EDC_FLOOR)
    return 10.0 * jnp.log10(jnp.maximum(edc / total, _EDC_FLOOR))


def _fit_decay_slope(db: jnp.ndarray, sample_rate: int,
                     db_start: float, db_end: float) -> jnp.ndarray:
    """Weighted least-squares slope (dB/s) of the decay between two
    levels of the dB EDC ``[..., T]``.

    The evaluation window is dynamic (it depends on where the curve
    crosses the levels), so instead of slicing we fit with a 0/1 weight
    mask — jit-safe at fixed shapes. Returns NaN where the window holds
    fewer than two samples (decay never reaches ``db_end``).
    """
    t = jnp.arange(db.shape[-1], dtype=jnp.float32) / sample_rate
    w = ((db <= db_start) & (db >= db_end)).astype(jnp.float32)
    # where(w, db, 0) rather than w * db: a -inf/nan OUTSIDE the window
    # (e.g. an all-zero tail) must not poison the masked sums.
    db = jnp.where(w > 0, db, 0.0)
    n = jnp.sum(w, axis=-1)
    sum_t = jnp.sum(w * t, axis=-1)
    sum_y = jnp.sum(w * db, axis=-1)
    sum_tt = jnp.sum(w * t * t, axis=-1)
    sum_ty = jnp.sum(w * t * db, axis=-1)
    denom = n * sum_tt - sum_t * sum_t
    slope = (n * sum_ty - sum_t * sum_y) / jnp.where(denom > 0, denom, 1.0)
    return jnp.where((n >= 2) & (denom > 0), slope, jnp.nan)


def decay_time(ir: jnp.ndarray, sample_rate: int,
               db_start: float = -5.0, db_end: float = -25.0) -> jnp.ndarray:
    """Reverberation time extrapolated to -60 dB from a line fit on the
    EDC between ``db_start`` and ``db_end``.

    ``(-5, -25)`` is T20, ``(-5, -35)`` is T30, ``(0, -10)`` is EDT —
    all return the *60 dB* time (ISO 3382 convention). NaN where the
    decay never genuinely spans the window: a truncated IR's normalized
    EDC always plunges at the tail (the backward integral runs empty),
    so the fit additionally requires ``db_end`` to sit >= 10 dB above
    the truncation floor ``10 log10(edc[-1]/edc[0])``.
    """
    db = edc_db(ir)
    slope = _fit_decay_slope(db, sample_rate, db_start, db_end)
    ok = (slope < 0) & (db_end >= db[..., -1] + 10.0)
    return jnp.where(ok, -60.0 / slope, jnp.nan)


def rt60_t20(ir: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    return decay_time(ir, sample_rate, -5.0, -25.0)


def rt60_t30(ir: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    return decay_time(ir, sample_rate, -5.0, -35.0)


def early_decay_time(ir: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    return decay_time(ir, sample_rate, 0.0, -10.0)


def _early_late(ir: jnp.ndarray, sample_rate: int, split_ms: float,
                ref_bin: jnp.ndarray):
    """Early/late energy split at ``ref + split_ms`` — the split is
    measured from the direct arrival (``ref_bin``), per ISO 3382."""
    t = jnp.arange(ir.shape[-1])
    split = ref_bin[..., None] + split_ms * 1e-3 * sample_rate
    early = jnp.sum(jnp.where(t < split, ir, 0.0), axis=-1)
    late = jnp.sum(jnp.where(t >= split, ir, 0.0), axis=-1)
    return early, late


def clarity(ir: jnp.ndarray, sample_rate: int,
            split_ms: float = 80.0) -> jnp.ndarray:
    """C80 (``split_ms=80``) / C50 (``=50``): ``10 log10(early/late)`` dB
    around a split measured from the direct arrival."""
    early, late = _early_late(ir, sample_rate, split_ms,
                              direct_arrival_bin(ir))
    return 10.0 * jnp.log10(jnp.maximum(early, _EDC_FLOOR)
                            / jnp.maximum(late, _EDC_FLOOR))


def definition(ir: jnp.ndarray, sample_rate: int,
               split_ms: float = 50.0) -> jnp.ndarray:
    """D50: fraction of total energy arriving within ``split_ms`` of the
    direct sound, in [0, 1]."""
    early, late = _early_late(ir, sample_rate, split_ms,
                              direct_arrival_bin(ir))
    return early / jnp.maximum(early + late, _EDC_FLOOR)


def centre_time(ir: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    """Energy centroid time ``ts = sum(t E) / sum(E)`` in seconds."""
    t = jnp.arange(ir.shape[-1], dtype=jnp.float32) / sample_rate
    total = jnp.maximum(jnp.sum(ir, axis=-1), _EDC_FLOOR)
    return jnp.sum(ir * t, axis=-1) / total


def iacc(left: jnp.ndarray, right: jnp.ndarray, sample_rate: int, *,
         max_lag_ms: float = 1.0, t_start_s: float = 0.0,
         t_end_s: float | None = None) -> jnp.ndarray:
    """Interaural cross-correlation coefficient (ISO 3382-1 Annex B).

    ``IACC = max_tau |integral l(t) r(t + tau) dt| / sqrt(E_l E_r)`` over
    lags ``|tau| <= max_lag_ms`` (the standard +-1 ms), evaluated on the
    ``[t_start_s, t_end_s)`` span of the two ear IRs ``[..., T]``.
    1 = interaurally coherent (a mono field dup'ed to both ears — sounds
    "in the head"), -> 0 = fully decorrelated (a real diffuse late field;
    IACC_late of good halls is ~0.1-0.3). Use ``t_start_s ~ 80 ms`` for
    the late-field IACC_L that the binaural decorrelator targets.
    """
    lo = int(round(t_start_s * sample_rate))
    hi = left.shape[-1] if t_end_s is None else int(round(
        t_end_s * sample_rate))
    seg_l = left[..., lo:hi]
    seg_r = right[..., lo:hi]
    max_lag = max(1, int(round(max_lag_ms * 1e-3 * sample_rate)))
    energy = jnp.sqrt(jnp.sum(seg_l * seg_l, axis=-1) *
                      jnp.sum(seg_r * seg_r, axis=-1))
    pad = jnp.pad(seg_r,
                  [(0, 0)] * (seg_r.ndim - 1) + [(max_lag, max_lag)])
    n = seg_l.shape[-1]
    corrs = jnp.stack(
        [jnp.abs(jnp.sum(seg_l * pad[..., k:k + n], axis=-1))
         for k in range(2 * max_lag + 1)], axis=-1)
    return jnp.max(corrs, axis=-1) / jnp.maximum(energy, _EDC_FLOOR)


def direct_arrival_bin(ir: jnp.ndarray,
                       threshold: float = 1e-2) -> jnp.ndarray:
    """Bin index of the first arrival: the first bin holding at least
    ``threshold`` of the IR's peak bin energy (guards against a stray
    early low-energy deposit claiming the direct sound)."""
    peak = jnp.max(ir, axis=-1, keepdims=True)
    return jnp.argmax(ir >= threshold * jnp.maximum(peak, _EDC_FLOOR),
                      axis=-1)


def direct_arrival_time(ir: jnp.ndarray, sample_rate: int,
                        threshold: float = 1e-2) -> jnp.ndarray:
    return direct_arrival_bin(ir, threshold).astype(jnp.float32) / sample_rate


def analyze_ir(ir: jnp.ndarray, sample_rate: int,
               speed_of_sound: float = 343.0) -> Dict[str, np.ndarray]:
    """All metrics for an IR in the framework's layouts.

    Accepts ``[T]``, ``[T, K]`` or ``[L, T, K]`` (the :class:`IRState`
    layout); returns a dict of numpy arrays shaped ``[]``, ``[K]`` or
    ``[L, K]`` respectively. ``direct_distance_m`` is the path length
    implied by the first arrival at ``speed_of_sound``.
    """
    x = jnp.asarray(ir, jnp.float32)
    if x.ndim == 1:
        x = x[None, :, None]
    elif x.ndim == 2:
        x = x[None]
    if x.ndim != 3:
        raise ValueError(f"expected [T] / [T,K] / [L,T,K], got {ir.shape}")
    x = jnp.moveaxis(x, 1, -1)  # [L, K, T]

    out = _metrics(x, sample_rate, speed_of_sound)
    nd = jnp.asarray(ir).ndim
    result = {}
    for k, v in out.items():
        a = np.asarray(v)
        if nd == 1:
            a = a[0, 0]
        elif nd == 2:
            a = a[0]
        result[k] = a
    return result


def analyze_dataset(irs, sample_rate: int,
                    speed_of_sound: float = 343.0) -> Dict[str, np.ndarray]:
    """Batch metrics for an IR dataset ``[n_rooms, L, T, K]`` (the
    ``sweep`` output layout): one vectorized pass over the whole batch —
    every estimator here is pure jnp over trailing time, so rooms,
    listeners, and bands are just batch dims. Returns ``[n_rooms, L, K]``
    arrays (same keys as :func:`analyze_ir`)."""
    x = jnp.moveaxis(jnp.asarray(irs, jnp.float32), 2, -1)  # [N, L, K, T]
    return {k: np.asarray(v)
            for k, v in _metrics(x, sample_rate, speed_of_sound).items()}


def _metrics(x: jnp.ndarray, sample_rate: int,
             speed_of_sound: float) -> Dict[str, jnp.ndarray]:
    """All metrics for ``x`` shaped ``[..., T]``; values keep the batch
    dims."""
    t_direct = direct_arrival_time(x, sample_rate)
    return {
        "rt60_t20_s": rt60_t20(x, sample_rate),
        "rt60_t30_s": rt60_t30(x, sample_rate),
        "edt_s": early_decay_time(x, sample_rate),
        "c50_db": clarity(x, sample_rate, 50.0),
        "c80_db": clarity(x, sample_rate, 80.0),
        "d50": definition(x, sample_rate, 50.0),
        "centre_time_s": centre_time(x, sample_rate),
        "direct_time_s": t_direct,
        "direct_distance_m": t_direct * speed_of_sound,
        "total_energy": jnp.sum(x, axis=-1),
    }
