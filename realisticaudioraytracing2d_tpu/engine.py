"""High-level engine: trace -> IR accumulation -> convolution.

The functional replacement of the reference's orchestrators
(``RayTraceManager.RunSimulation``/``OnSimulationFinished``,
``Assets/Script/RayTraceManager.cs:179-244``, and the legacy offline
``BakeAudio`` path, ``RayTraceManagerComplex.cs:170-227``): per-frame state
is an explicit :class:`~.ops.ir.IRState` threaded through pure jitted
steps, multi-frame Monte-Carlo accumulation is a ``lax.scan`` inside one
compiled program, and the offline bake is FFT convolution + peak
normalization.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .config import EngineConfig
from .models.scene import Scene
from .ops import convolve as cv
from .ops import ir as irm
from .ops import rng as _rng
from .ops.trace import DebugPaths, Hits, TraceParams, trace, trace_hits_only


def _fused_eligible(scene: Scene, params: TraceParams,
                    ir_length: int) -> bool:
    """The fused Pallas path covers any listener count (listener blocks
    of <=4 are launched back-to-back, bit-exactly — ray physics never
    reads the listener table) and any practical band count: histograms
    too large for VMEM even at one listener run as IR time-axis windows
    (bit-exact, one shared compile); it only pays off on real TPU
    hardware (interpret mode elsewhere would be slower than XLA). Only
    scenes past the brute kernel's wall ceiling (routed to accel/jnp)
    or absurd band counts (>~320) fall back. Directive sources and
    microphone patterns (round 3) run in-kernel: emission and capture
    weighting by the Fourier gain series, so spatial IRs
    (``spatial.py``) and ``--stereo-aim`` ride the fast path too."""
    if jax.default_backend() != "tpu":
        return False
    from .ops.pallas.bounce_kernel import auto_tile, time_window
    try:
        auto_tile(scene.a.shape[0])  # raises past the ~5k-wall VMEM budget
    except ValueError:
        return False
    # time_window >= 1 means the config can run as IR time-axis windows
    # even when a full-length single-listener histogram overflows VMEM
    # (subsumes the listener_block >= 1 condition)
    return time_window(scene.n_bands) >= 1


def _rooms_fused_eligible(scene: Scene, params: TraceParams,
                          ir_length: int) -> bool:
    """Eligibility for the ROOMS-batched mega kernel (dataset sweeps,
    one-launch multi-source mixdown). Round 3: the rooms kernel gained
    the same IR time-window decomposition as the single-scene wrappers,
    so banded/long-IR sweeps and mixdowns stay fused — only scenes past
    the brute kernel's wall ceiling or absurd band counts (>~320) fall
    back to jnp. Directive sources/mics (including per-source aims in a
    mixdown) run in-kernel here too (round 3)."""
    if jax.default_backend() != "tpu":
        return False
    from .ops.pallas.bounce_kernel import auto_tile, time_window
    try:
        auto_tile(scene.a.shape[0])
    except ValueError:
        return False
    return time_window(scene.n_bands) >= 1


def _accel_eligible(scene, params: TraceParams, ir_length: int) -> bool:
    """Large-scene cluster-early-out path (docs/ACCEL.md): any wall count,
    any listener count (blocked launches), over-VMEM histograms as IR
    time windows, TPU only. K = 1 additionally gets the per-bounce
    Morton ray re-sort (best skip rates); banded scenes use the
    one-launch accel kernel (early-out without re-sort). Directive
    sources/mics run in-kernel here too (round 3), so large directive
    scenes stay on the accel fast path."""
    from .ops.pallas.bounce_kernel import time_window
    return (jax.default_backend() == "tpu"
            and time_window(scene.n_bands) >= 1)


@partial(jax.jit,
         static_argnames=("n_rays", "max_bounces", "sample_rate", "n_frames",
                          "backend"))
def trace_accumulate(scene: Scene, params: TraceParams, state: irm.IRState,
                     key: jax.Array, *, n_rays: int, max_bounces: int,
                     sample_rate: int, n_frames: int = 1,
                     backend: str = "auto") -> irm.IRState:
    """Run ``n_frames`` trace frames and accumulate them into ``state`` —
    the Update->RunSimulation->ProcessHits loop as one compiled scan.

    Each frame folds its index into the key (the functional analogue of the
    reference's ``rngStateOffset = Time.frameCount`` reseed,
    RayTraceManager.cs:197), so frames are independent MC samples.

    ``backend``: "auto" routes supported configs (any listener count via
    blocked launches; bands limited by the single-listener VMEM histogram
    budget) to the fused Pallas bounce kernel with in-kernel MXU
    histogram on TPU (~4x faster than the XLA graph path); scenes past
    the fused kernel's ~5k-wall VMEM ceiling route to the
    cluster-early-out accel path (any wall count; K = 1 adds the
    per-bounce Morton ray re-sort); "jnp" forces the reference XLA-graph
    path; "fused"/"accel" force the respective kernel paths.
    """
    use_fused = (backend == "fused" or
                 (backend == "auto"
                  and _fused_eligible(scene, params, state.ir_length)))
    if use_fused:
        from .ops.pallas.bounce_kernel import trace_accumulate_fused
        return trace_accumulate_fused(
            scene, params, state, key, n_rays=n_rays,
            max_bounces=max_bounces, sample_rate=sample_rate,
            n_frames=n_frames)
    use_accel = (backend == "accel" or
                 (backend == "auto"
                  and _accel_eligible(scene, params, state.ir_length)))
    if use_accel:
        from .ops.pallas.bounce_kernel import (trace_frames_ir_accel,
                                               trace_frames_ir_accel_sorted)
        if scene.n_bands == 1:
            ir = trace_frames_ir_accel_sorted(
                scene, params, key, n_rays=n_rays, max_bounces=max_bounces,
                sample_rate=sample_rate, ir_length=state.ir_length,
                n_frames=n_frames)
        else:
            ir = trace_frames_ir_accel(
                scene, params, key, n_rays=n_rays, max_bounces=max_bounces,
                sample_rate=sample_rate, ir_length=state.ir_length,
                n_frames=n_frames)
        return irm.IRState(sum=state.sum + ir,
                           frames=state.frames + n_frames)

    def body(st, i):
        hits = trace_hits_only(scene, params, _rng.frame_key(key, i),
                               n_rays=n_rays, max_bounces=max_bounces)
        return irm.accumulate(st, hits, sample_rate), None

    state, _ = jax.lax.scan(body, state,
                            jnp.arange(n_frames, dtype=jnp.int32))
    return state


@partial(jax.jit, static_argnames=("normalize",))
def bake_audio(dry: jax.Array, state: irm.IRState, *,
               normalize: bool = True) -> jax.Array:
    """Offline bake: convolve a full dry clip with the accumulated IR.

    Reference: ``BakeAudio`` dispatches the direct-convolution kernel over
    the whole clip then peak-normalizes before playback
    (``RayTraceManagerComplex.cs:170-245``). Here: one FFT convolution
    against the frame-averaged (optionally banded, multi-listener) IR.
    Returns ``[N+T]`` mono or ``[L, N+T]``.
    """
    ir = state.normalized()                  # [L, T, K]
    if ir.shape[0] == 1:
        ir = ir[0]                           # -> [T, K] (mono listener)
    wet = cv.apply_ir(dry, ir, accum_count=1)
    return cv.peak_normalize(wet) if normalize else wet


class Engine:
    """Convenience wrapper binding a scene + config to the pure functions.

    Keeps no mutable simulation state — it only caches static shape info so
    call sites stay terse. All returned values are pytrees you thread
    yourself (or via :class:`~.streaming.Streamer`).
    """

    def __init__(self, scene: Scene, config: EngineConfig,
                 n_listeners: int = 1):
        self.scene = scene
        self.config = config
        self.n_listeners = n_listeners

    # -- state constructors --------------------------------------------------
    def fresh_ir(self) -> irm.IRState:
        return irm.IRState.zeros(self.config.audio.ir_length,
                                 self.n_listeners, self.scene.n_bands)

    def params(self, source, listener, directivity=None,
               mic_directivity=None) -> TraceParams:
        return TraceParams.make(
            source, listener,
            listener_radius=self.config.sim.listener_radius,
            speed_of_sound=self.config.sim.speed_of_sound,
            input_gain=self.config.sim.input_gain,
            directivity=directivity, mic_directivity=mic_directivity)

    # -- simulation ----------------------------------------------------------
    def trace_frames(self, params: TraceParams, key: jax.Array,
                     n_frames: int = 1,
                     state: Optional[irm.IRState] = None) -> irm.IRState:
        state = self.fresh_ir() if state is None else state
        return trace_accumulate(
            self.scene, params, state, key,
            n_rays=self.config.sim.ray_count,
            max_bounces=self.config.sim.max_bounces,
            sample_rate=self.config.audio.sample_rate, n_frames=n_frames)

    def trace_debug(self, params: TraceParams, key: jax.Array,
                    n_debug: int = 100) -> Tuple[Hits, DebugPaths]:
        hits, dbg = trace(self.scene, params, key,
                          n_rays=self.config.sim.ray_count,
                          max_bounces=self.config.sim.max_bounces,
                          n_debug=n_debug)
        return hits, dbg

    def bake(self, dry: jax.Array, state: irm.IRState,
             normalize: bool = True) -> jax.Array:
        return bake_audio(dry, state, normalize=normalize)
