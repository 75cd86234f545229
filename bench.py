"""Benchmark suite — prints ONE JSON line with the headline metric.

Headline: ray-bounce intersection throughput per chip (BASELINE.json
north-star target: >= 100e6 /s/chip on the trace kernel semantics of
``Raytrace2D.compute:49-156``, counting both the nearest-hit pass and the
NEE occlusion pass like BASELINE.md does). ``vs_baseline`` is the ratio to
that 100 M/s target.

Secondary diagnostics (IR build ms, streaming xRT at 44.1 kHz, rooms/s
sweep rate) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    # Persistent XLA compile cache: the bench compiles ~10 distinct TPU
    # programs (~60-90 s each through the relay); cached reruns start in
    # seconds. Same dir as tests_tpu/conftest.py.
    import os as _os
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_os.path.dirname(
                          _os.path.abspath(__file__)),
                          ".jax_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass  # cache is an optimization; never block the bench on it


def _sync(x):
    # Fetch a scalar: through the remote-TPU tunnel, block_until_ready
    # has been observed to return before execution completes; a data
    # readback is a reliable barrier.
    np.asarray(jnp.sum(x))
    return x


def bench_trace(n_rays=131072, max_bounces=8, n_frames=50,
                sample_rate=48000, ir_length=72000):
    """Frame loop runs *inside* one jit (lax.scan over frames) so the
    measurement reflects device throughput, not per-call host dispatch
    latency (~1 ms/call through the remote-TPU tunnel)."""
    import realisticaudioraytracing2d_tpu as art
    from realisticaudioraytracing2d_tpu.engine import trace_accumulate
    from realisticaudioraytracing2d_tpu.ops.ir import IRState

    room = art.rooms.smoll_room(pad_to=32)
    n_valid_walls = int(np.asarray(room.scene.n_valid))
    params = art.TraceParams.make(room.source, room.listener,
                                  room.listener_radius, 343.0, 1.0)
    key = jax.random.PRNGKey(0)

    def run(st, k):
        return trace_accumulate(room.scene, params, st, k,
                                n_rays=n_rays, max_bounces=max_bounces,
                                sample_rate=sample_rate, n_frames=n_frames)

    _sync(run(IRState.zeros(ir_length, 1, 1), key).sum)  # compile
    _sync(run(IRState.zeros(ir_length, 1, 1),
              jax.random.fold_in(key, 9)).sum)  # warm (first post-compile
    # execution of a program runs measurably colder than steady state)
    dt = float("inf")
    for trial in range(3):  # best-of-3: the remote tunnel adds jitter
        state = IRState.zeros(ir_length, 1, 1)
        t0 = time.perf_counter()
        state = run(state, jax.random.fold_in(key, 1 + trial))
        _sync(state.sum)
        dt = min(dt, time.perf_counter() - t0)

    frame_ms = dt / n_frames * 1e3
    # nearest-hit pass + NEE occlusion pass, valid walls only (padded lanes
    # not counted, though they are computed).
    tests = n_rays * max_bounces * n_valid_walls * 2 * n_frames
    return tests / dt, frame_ms


def bench_quad(n_frames=50, sample_rate=48000, ir_length=72000):
    """4-listener fused frame cost at the reference workload (the round-2
    scal-row widening: all four ears share every wall sweep)."""
    import realisticaudioraytracing2d_tpu as art
    from realisticaudioraytracing2d_tpu.engine import trace_accumulate
    from realisticaudioraytracing2d_tpu.ops.ir import IRState

    room = art.rooms.smoll_room(pad_to=32)
    ears = np.asarray([[0.0, -3.68], [0.5, -3.68], [-6.0, 2.0],
                       [8.0, -1.0]], np.float32)
    params = art.TraceParams.make(room.source, ears, 0.5, 343.0, 1.0)

    def run(k):
        return trace_accumulate(room.scene, params,
                                IRState.zeros(ir_length, 4, 1), k,
                                n_rays=15000, max_bounces=5,
                                sample_rate=sample_rate, n_frames=n_frames)

    key = jax.random.PRNGKey(0)
    _sync(run(key).sum)
    t0 = time.perf_counter()
    _sync(run(jax.random.fold_in(key, 1)).sum)
    return (time.perf_counter() - t0) / n_frames * 1e3


def bench_ir_build(n_frames=20, sample_rate=48000, ir_length=72000):
    """IR scatter cost alone: accumulate pre-traced hits."""
    import realisticaudioraytracing2d_tpu as art
    from realisticaudioraytracing2d_tpu.ops import ir as irm
    from realisticaudioraytracing2d_tpu.ops.trace import trace_hits_only

    room = art.rooms.smoll_room(pad_to=32)
    params = art.TraceParams.make(room.source, room.listener, 0.5, 343.0,
                                  1.0)
    hits = trace_hits_only(room.scene, params, jax.random.PRNGKey(0),
                           n_rays=15000, max_bounces=5)
    _sync(hits.valid)
    scatter = jax.jit(lambda h: irm.scatter_hits(h, sample_rate, ir_length))
    _sync(scatter(hits))
    t0 = time.perf_counter()
    for _ in range(n_frames):
        out = scatter(hits)
    _sync(out)
    return (time.perf_counter() - t0) / n_frames * 1e3


def bench_streaming_xrt(sample_rate=44100, reverb=1.5, chunk=0.1,
                        n_chunks=20):
    """Streaming conv throughput: chunks/s vs realtime (trace excluded —
    convolution + ring path only, matching the 'streaming convolution xRT'
    metric)."""
    from realisticaudioraytracing2d_tpu.ops.convolve import (
        convolve_chunk_crossfade)

    n = int(sample_rate * chunk)
    t = int(sample_rate * reverb)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, n),
                    jnp.float32)
    ir = jnp.asarray(np.random.default_rng(1).uniform(0, 1e-3, t),
                     jnp.float32)
    f = jax.jit(lambda a, i1, i2: convolve_chunk_crossfade(a, i1, i2, 1, 1))
    _sync(f(x, ir, ir))
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out = f(x, ir, ir)
    _sync(out)
    dt = time.perf_counter() - t0
    return (n_chunks * chunk) / dt


def bench_sweep(n_rooms=1024, n_rays=4096, max_bounces=6, ir_length=24000):
    """Room-dataset generation rate (config #5: the full 1024-room dataset
    in ONE launch of the rooms-batched mega kernel — rooms ride the
    leading grid axis, so per-dispatch relay latency is amortized across
    the whole dataset, which is how a real dataset job runs)."""
    import jax.random

    from realisticaudioraytracing2d_tpu.models.rooms import random_rooms
    from realisticaudioraytracing2d_tpu.parallel.sweep import sweep_rooms

    scenes, sources, listeners = random_rooms(n_rooms, seed=0)
    kw = dict(n_rays=n_rays, max_bounces=max_bounces, sample_rate=16000,
              ir_length=ir_length, n_frames=1)
    irs = sweep_rooms(scenes, sources, listeners, jax.random.PRNGKey(0),
                      **kw)
    _sync(irs)
    t0 = time.perf_counter()
    irs = sweep_rooms(scenes, sources, listeners, jax.random.PRNGKey(1),
                      **kw)
    _sync(irs)
    return n_rooms / (time.perf_counter() - t0)


def bench_stream_chunk(n_chunks=30):
    """Full streaming step (retrace 15k rays + crossfaded convolution +
    ring overlap-add/drain) steady-state cost per 0.1 s chunk — the
    '60 Hz IR-update + streaming loop fully on TPU' north-star loop."""
    import jax.random

    import realisticaudioraytracing2d_tpu as art

    room = art.rooms.smoll_room(pad_to=32)
    cfg = art.smoll_room_config()
    eng = art.Engine(room.scene, cfg)
    p = eng.params(room.source, room.listener)
    streamer = art.Streamer(room.scene, cfg, jax.random.PRNGKey(0))
    chunk = jnp.zeros((cfg.audio.chunk_samples,), jnp.float32).at[0].set(1.0)
    _sync(streamer.process(chunk, p))          # compile
    _sync(streamer.process(chunk, p))          # warm
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out = streamer.process(chunk, p)
    _sync(out)
    return (time.perf_counter() - t0) / n_chunks * 1e3


def bench_stream_chunk_modes(n_chunks=30):
    """Steady-state chunk cost of the flagship streaming modes
    (round-4/5 paths the bench previously missed): per-arrival Doppler
    (device-sliced dry-history window + gliding tap synthesis),
    binaural (3-virtual-mic spatial trace + ITD/ILD decode), and the
    two composed. Per 0.1 s chunk, like bench_stream_chunk."""
    import jax.random

    import realisticaudioraytracing2d_tpu as art
    from realisticaudioraytracing2d_tpu.streaming import window_scalars

    room = art.rooms.smoll_room(pad_to=32)
    cfg = art.smoll_room_config()
    eng = art.Engine(room.scene, cfg)
    p = eng.params(room.source, room.listener)
    n = cfg.audio.chunk_samples
    dry = jnp.asarray(np.random.default_rng(0)
                      .uniform(-1, 1, 4 * n).astype(np.float32))
    chunk = dry[:n]

    def run_mode(streamer, per_arrival, facing):
        wd = n + streamer.arrival_early + 2

        def window(i):
            if not per_arrival:
                return None
            return (dry,) + window_scalars(i, n, wd, dry.shape[-1],
                                           True) + (True,)

        out = streamer.process(chunk, p, facing=facing, window=window(0))
        _sync(out)                                   # compile
        out = streamer.process(chunk, p, facing=facing, window=window(1))
        _sync(out)                                   # warm
        t0 = time.perf_counter()
        for i in range(n_chunks):
            out = streamer.process(chunk, p, facing=facing,
                                   window=window(2 + i))
        _sync(out)
        return (time.perf_counter() - t0) / n_chunks * 1e3

    key = jax.random.PRNGKey(0)
    pa = run_mode(art.Streamer(room.scene, cfg, key), True, 0.0)
    bi = run_mode(art.Streamer(room.scene, cfg, key, binaural=True),
                  False, 0.3)
    bpa = run_mode(art.Streamer(room.scene, cfg, key, binaural=True),
                   True, 0.3)
    return pa, bi, bpa


def bench_accel(n_boxes=10000, n_rays=131072, max_bounces=6):
    """Large-scene path (docs/ACCEL.md): cluster-early-out + Morton ray
    re-sort vs brute force on a 40k-wall procedural city. Reports
    (accel_ms, brute-equivalent G wall tests/s, speedup)."""
    import jax.random

    import realisticaudioraytracing2d_tpu as art
    from realisticaudioraytracing2d_tpu.models.rooms import city_scene
    from realisticaudioraytracing2d_tpu.ops.pallas.bounce_kernel import (
        trace_frames_ir_accel_sorted)

    room = city_scene(n_boxes=n_boxes)
    params = art.TraceParams.make(room.source, room.listener,
                                  room.listener_radius, 343.0, 100.0)
    kw = dict(n_rays=n_rays, max_bounces=max_bounces, sample_rate=16000,
              ir_length=24000, n_frames=4, cluster_size=128)

    def timed(**extra):
        ir = trace_frames_ir_accel_sorted(room.scene, params,
                                          jax.random.PRNGKey(0), **kw,
                                          **extra)
        _sync(ir)
        t0 = time.perf_counter()
        ir = trace_frames_ir_accel_sorted(room.scene, params,
                                          jax.random.PRNGKey(1), **kw,
                                          **extra)
        _sync(ir)
        return time.perf_counter() - t0

    t_brute = timed(early_out=False)
    t_accel = timed(early_out=True)
    tests = n_rays * max_bounces * 2 * room.scene.n_walls * kw["n_frames"]
    return (t_accel * 1e3, tests / t_accel / 1e9, t_brute / t_accel,
            room.scene.n_walls)


def main():
    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", file=sys.stderr)

    rps, frame_ms = bench_trace()
    _, ref_frame_ms = bench_trace(n_rays=15000, max_bounces=5)
    quad_ms = bench_quad()
    ir_ms = bench_ir_build()
    xrt = bench_streaming_xrt()
    chunk_ms = bench_stream_chunk()
    pa_ms, bi_ms, bpa_ms = bench_stream_chunk_modes()
    rooms_s = bench_sweep()
    accel_ms, accel_gts, accel_speedup, accel_walls = bench_accel()
    # the two-level sweep's speedup grows with wall count: show the
    # 100k-wall point too (docs/ACCEL.md round-3 table)
    mega_ms, mega_gts, mega_speedup, mega_walls = bench_accel(
        n_boxes=25002)

    print(f"trace frame @131k rays x 8 bounces: {frame_ms:.2f} ms; "
          f"@reference workload 15k x 5: {ref_frame_ms:.2f} ms "
          f"(60Hz budget: {'OK' if ref_frame_ms < 16.6 else 'OVER'}); "
          f"4-listener fused: {quad_ms:.2f} ms/frame; "
          f"IR scatter: {ir_ms:.2f} ms; "
          f"streaming conv: {xrt:.0f}x realtime @44.1kHz; "
          f"full stream chunk (retrace+conv+ring): {chunk_ms:.1f} ms per "
          f"100 ms chunk; "
          f"per-arrival Doppler chunk: {pa_ms:.1f} ms; "
          f"binaural chunk: {bi_ms:.1f} ms; "
          f"binaural+per-arrival chunk: {bpa_ms:.1f} ms; "
          f"room sweep: {rooms_s:.1f} rooms/s (4096 rays x 6 bounces); "
          f"large scene ({accel_walls} walls): {accel_ms:.0f} ms/4 frames, "
          f"{accel_gts:.0f} G tests/s brute-equivalent, "
          f"{accel_speedup:.1f}x over brute; "
          f"({mega_walls} walls): {mega_ms:.0f} ms/4 frames, "
          f"{mega_gts:.0f} G tests/s brute-equivalent, "
          f"{mega_speedup:.1f}x over brute",
          file=sys.stderr)

    result = {
        "metric": "ray_bounce_intersections_per_sec_per_chip",
        "value": float(f"{rps:.4g}"),
        "unit": "intersections/s",
        "vs_baseline": float(f"{rps / 100e6:.4g}"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
