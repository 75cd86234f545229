#!/usr/bin/env python
"""Long-run live-session soak (round-4 VERDICT stretch): one on-chip
LivePlayer session of N minutes — looped clip, realtime audio clock,
a chatty pose feed steering the source the whole time — asserting the
"real-time framework" claim holds beyond the ~2 s test runs:

* 0 underruns after the prebuffer,
* flat RSS (no leak in the chunk loop, the feed, or the ring),
* flat per-chunk producer latency (no drift as the stream ages).

Run (TPU; do not run concurrently with any other TPU process):

    python scripts/soak_live.py --minutes 10

Prints a per-minute table (chunk p50/p95 ms, RSS, feed lines, ring
lead) and a final PASS/FAIL verdict; docs/PERF.md records the result.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--rays", type=int, default=15000)
    ap.add_argument("--feed-hz", type=float, default=10.0,
                    help="pose-feed line rate (chatty UI simulation)")
    ap.add_argument("--per-arrival", action="store_true",
                    help="soak the per-arrival Doppler path instead of "
                         "the plain stream")
    ap.add_argument("--cpu", action="store_true",
                    help="run the identical loop on the CPU backend — "
                         "the control for separating growth in THIS "
                         "code (feed/ring/player host loop) from growth "
                         "in the TPU relay client")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # Persistent XLA compile cache (same dir as bench.py /
    # tests_tpu/conftest.py): without it every soak pays ~10 cold Mosaic
    # compiles through the relay, which contaminates the latency columns
    # and can alone blow the realtime budget at small --minutes.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))),
                          ".jax_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    import realisticaudioraytracing2d_tpu as art
    from realisticaudioraytracing2d_tpu.live import LivePlayer
    from realisticaudioraytracing2d_tpu.posefeed import PoseFeed
    from realisticaudioraytracing2d_tpu.utils.audio_io import noise_burst

    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=args.rays)
    eng = art.Engine(room.scene, cfg)
    sr = cfg.audio.sample_rate
    n = cfg.audio.chunk_samples
    chunk_dt = cfg.audio.chunk_duration
    total_chunks = max(2, int(round(args.minutes * 60.0 / chunk_dt)))
    dry = jnp.asarray(noise_burst(2.0, sr, seed=7) * 0.2)

    # chatty steering feed: a writer thread appends source moves at
    # feed_hz for the whole session (the folding keeps poll cost flat)
    feed_path = "/tmp/soak_feed.jsonl"
    open(feed_path, "w").close()
    feed = PoseFeed.open(feed_path).bind_scene(room.builder)
    stop_writer = threading.Event()
    src = np.asarray(room.source, np.float64)

    def writer():
        i = 0
        while not stop_writer.is_set():
            line = {"source": [float(src[0] + 2.0 * np.sin(i / 50.0)),
                               float(src[1])]}
            with open(feed_path, "a") as f:
                f.write(json.dumps(line) + "\n")
            i += 1
            stop_writer.wait(1.0 / args.feed_hz)

    base = eng.params(room.source, room.listener)
    params_fn = lambda i: feed.params(base, i)            # noqa: E731

    # per-chunk telemetry from the producer hook
    t_chunk, rss, leads = [], [], []
    last = [time.perf_counter()]

    def on_chunk(i, _ir):
        now = time.perf_counter()
        t_chunk.append(now - last[0])
        last[0] = now
        if i % 100 == 0:
            rss.append((i, rss_mb()))
            print(f"  chunk {i}/{total_chunks} t+{now - t0:.0f}s "
                  f"rss {rss[-1][1]:.0f} MB", file=sys.stderr, flush=True)

    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(0))
    wt = threading.Thread(target=writer, daemon=True)
    wt.start()
    print(f"soaking {args.minutes:.1f} min = {total_chunks} chunks "
          f"(chunk {chunk_dt * 1e3:.0f} ms, {args.rays} rays, feed "
          f"{args.feed_hz:.0f} lines/s, "
          f"{'per-arrival' if args.per_arrival else 'plain'}) ...",
          flush=True)
    t0 = time.perf_counter()
    rep = player.run(dry, total_chunks=total_chunks, loop=True,
                     realtime=True, params_fn=params_fn,
                     on_chunk=on_chunk, record=False,
                     doppler="per_arrival" if args.per_arrival else False)
    wall = time.perf_counter() - t0
    stop_writer.set()
    wt.join()

    lat = np.asarray(t_chunk[2:]) * 1e3          # skip compile chunks
    per_min = max(1, int(60.0 / chunk_dt))
    print(f"\n{'minute':>6} {'p50 ms':>8} {'p95 ms':>8} {'max ms':>8} "
          f"{'rss MB':>8}")
    for m in range(0, len(lat), per_min):
        seg = lat[m:m + per_min]
        r = [v for i, v in rss if m <= i < m + per_min]
        print(f"{m // per_min:6d} {np.median(seg):8.1f} "
              f"{np.percentile(seg, 95):8.1f} {seg.max():8.1f} "
              f"{(r[-1] if r else float('nan')):8.0f}")

    tenth = max(1, len(lat) // 10)
    head_p50 = float(np.median(lat[:tenth]))
    tail_p50 = float(np.median(lat[-tenth:]))
    rss_vals = [v for _, v in rss]
    n_chunks_span = (rss[-1][0] - rss[0][0]) if len(rss) > 1 else 1
    rss_rate_kb = ((rss_vals[-1] - rss_vals[0]) * 1024.0 / n_chunks_span
                   if len(rss_vals) > 1 else 0.0)
    print(f"\n{rep.summary()}")
    print(f"wall {wall:.1f}s for {total_chunks * chunk_dt:.1f}s of audio; "
          f"chunk p50 head {head_p50:.1f} ms -> tail {tail_p50:.1f} ms; "
          f"RSS {rss_vals[0]:.0f} -> {rss_vals[-1]:.0f} MB "
          f"({rss_rate_kb:+.1f} KB/chunk); feed pending "
          f"{len(feed._pending)} lines")

    # RSS gate: per-chunk growth rate, not a session fraction — a
    # fraction conflates session length with leak rate. The framework's
    # own host loop measures ~1 KB/chunk (glibc/numpy noise; run the
    # identical loop with --cpu to reproduce: 1800 chunks, +0.3%); the
    # axon TPU relay CLIENT retains ~20 KB/chunk across its RPCs —
    # outside this repo, measured by the CPU-vs-TPU control pair, so
    # the TPU budget sits above the relay floor and the CPU budget is
    # strict. A leak in feed/ring/player shows up in BOTH modes.
    rss_budget = 4.0 if args.cpu else 40.0
    ok = (rep.underruns == 0
          and rss_rate_kb < rss_budget
          and tail_p50 < 1.5 * head_p50 + 1.0
          and len(feed._pending) < 100)
    print("SOAK " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
