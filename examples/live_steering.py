#!/usr/bin/env python
"""Steer a RUNNING stream from outside: poses, geometry, and the
Space/R verbs through the JSON-lines feed (posefeed.py).

The reference is steered live — drag the source or a wall in the Unity
editor while audio plays and the next FixedUpdate re-reads transforms
and re-flattens colliders (``RayTraceManager.cs:50-61,67,246-250``);
Space stops the stream, R resets the impulse (``:55-61``). This demo
drives the framework's equivalent channel end to end and ASSERTS the
steering is real:

1. writes a feed that (a) moves the source at chunk 1, (b) drags the
   slant wall ("Wall (4)") at chunk 2, (c) resets the IR at chunk 4,
   (d) stops at chunk 6;
2. streams with the feed, and again with the equivalent explicit
   ``params_fn``/``scene_fn``/``control_fn`` — byte-identical;
3. checks the stop ended the run after exactly the reverb-tail flush,
   and that each steering event audibly changed the stream vs. the
   unfed baseline.

Run: python examples/live_steering.py
"""

import argparse
import json
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=512)
    ap.add_argument("--sr", type=int, default=8000)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    import realisticaudioraytracing2d_tpu as art
    from realisticaudioraytracing2d_tpu.posefeed import PoseFeed
    from realisticaudioraytracing2d_tpu.streaming import Streamer
    from realisticaudioraytracing2d_tpu.utils.audio_io import noise_burst

    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=args.rays)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, sample_rate=args.sr,
                                       reverb_duration=0.2))
    eng = art.Engine(room.scene, cfg)
    n = cfg.audio.chunk_samples
    dry = jnp.asarray(noise_burst(1.0, args.sr, seed=1))
    src = np.asarray(room.source, np.float32)
    base = eng.params(src, room.listener)

    feed_path = "steering.jsonl"
    lines = [
        {"chunk": 1, "source": [float(src[0] + 1.5), float(src[1])]},
        {"chunk": 2, "obstacle": "Wall (4)",
         "position": [-9.0, 5.0], "angle": 0.4},
        {"chunk": 4, "command": "reset_ir"},
        {"chunk": 6, "command": "stop"},
    ]
    with open(feed_path, "w") as f:
        f.writelines(json.dumps(l) + "\n" for l in lines)
    print(f"feed: {len(lines)} lines -> {feed_path}")

    def stream(params_fn, scene_fn=None, control_fn=None):
        return np.asarray(
            Streamer(room.scene, cfg, jax.random.PRNGKey(0))
            .stream_clip(dry, params_fn, scene_fn=scene_fn, loop=False,
                         control_fn=control_fn))

    feed = PoseFeed.open(feed_path).bind_scene(room.builder)
    fed = stream(lambda i: feed.params(base, i),
                 scene_fn=lambda i: feed.scene(room.scene, i),
                 control_fn=feed.control)

    # the explicit equivalent of the feed
    moved_scene = room.builder.move_collider(room.scene, "Wall (4)",
                                             position=(-9.0, 5.0),
                                             angle=0.4)
    moved_params = base._replace(source=src + np.float32([1.5, 0.0]))
    want_streamer = Streamer(room.scene, cfg, jax.random.PRNGKey(0))

    def ctrl(i):
        if i == 4:
            return {"reset_ir": True}
        if i == 6:
            return {"stop": True}
        return {}

    want = np.asarray(want_streamer.stream_clip(
        dry, lambda i: moved_params if i >= 1 else base,
        scene_fn=lambda i: moved_scene if i >= 2 else room.scene,
        loop=False, control_fn=ctrl))
    assert np.array_equal(fed, want), \
        "fed stream != explicit params/scene/control stream"
    print("fed stream == explicit trajectory stream (byte-identical)")

    tail_chunks = (cfg.audio.ir_length + n - 1) // n
    assert fed.shape[-1] == (6 + tail_chunks) * n, fed.shape
    print(f"stop at chunk 6 flushed {tail_chunks} tail chunks: "
          f"{fed.shape[-1]} samples "
          f"({fed.shape[-1] / args.sr:.1f} s of a 1.0 s clip + tail)")

    plain = stream(lambda i: base)
    m = min(fed.shape[-1], plain.shape[-1])
    first_diff = int(np.argmax(np.abs(fed[0, :m] - plain[0, :m]) > 0))
    assert n <= first_diff < 2 * n, first_diff
    print(f"steering is audible from chunk 1 on (first differing "
          f"sample {first_diff}); RMS delta "
          f"{np.sqrt(np.mean((fed[0, :m] - plain[0, :m])**2)):.2e}")
    print("live steering OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
