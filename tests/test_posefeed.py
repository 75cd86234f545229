"""Interactive pose channel (posefeed.py): JSON-lines steering of a
running stream — the reference's edit-the-scene-while-it-plays loop
(``RayTraceManager.cs:50-61,67``) as a file/stdin feed."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.cli import main
from realisticaudioraytracing2d_tpu.engine import Engine
from realisticaudioraytracing2d_tpu.posefeed import PoseFeed, PoseFeedError
from realisticaudioraytracing2d_tpu.streaming import Streamer
from realisticaudioraytracing2d_tpu.utils.audio_io import (noise_burst,
                                                           read_wav,
                                                           write_wav)

TINY = ["--rays", "256", "--bounces", "4", "--frames", "1",
        "--reverb", "0.2", "--sample-rate", "8000"]


def feed_from(tmp_path, lines, name="feed.jsonl"):
    path = tmp_path / name
    path.write_text("".join(json.dumps(l) + "\n" for l in lines))
    return PoseFeed.open(str(path)), str(path)


def base_params():
    room = art.rooms.smoll_room()
    return art.TraceParams.make(room.source, room.listener, 0.5, 343.0,
                                1.0)


# ---- unit: parsing / hold semantics ----------------------------------------


def test_overrides_apply_at_their_chunk_and_hold(tmp_path):
    feed, _ = feed_from(tmp_path, [
        {"chunk": 1, "source": [1.0, 2.0]},
        {"chunk": 3, "listener": [5.0, 6.0], "facing": 0.5},
    ])
    p = base_params()
    p0 = feed.params(p, 0)
    np.testing.assert_array_equal(np.asarray(p0.source),
                                  np.asarray(p.source))
    p1 = feed.params(p, 1)
    np.testing.assert_array_equal(np.asarray(p1.source), [1.0, 2.0])
    # holds at chunk 2; listener still the trajectory's
    p2 = feed.params(p, 2)
    np.testing.assert_array_equal(np.asarray(p2.source), [1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(p2.listeners),
                                  np.asarray(p.listeners))
    assert feed.facing(9.9, 2) == 9.9
    p3 = feed.params(p, 3)
    np.testing.assert_array_equal(np.asarray(p3.source), [1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(p3.listeners),
                                  [[5.0, 6.0]])
    assert feed.facing(9.9, 3) == 0.5


def test_chunkless_line_applies_immediately(tmp_path):
    feed, _ = feed_from(tmp_path, [{"source": [3.0, 4.0]}])
    p5 = feed.params(base_params(), 5)
    np.testing.assert_array_equal(np.asarray(p5.source), [3.0, 4.0])


def test_tail_semantics_lines_appended_mid_stream(tmp_path):
    # lines written AFTER the feed was opened are picked up (tail -f)
    path = tmp_path / "feed.jsonl"
    path.write_text("")
    feed = PoseFeed.open(str(path))
    p = base_params()
    np.testing.assert_array_equal(np.asarray(feed.params(p, 0).source),
                                  np.asarray(p.source))
    with open(path, "a") as fh:
        fh.write(json.dumps({"source": [7.0, 8.0]}) + "\n")
    np.testing.assert_array_equal(np.asarray(feed.params(p, 1).source),
                                  [7.0, 8.0])


def test_partial_line_buffers_until_newline(tmp_path):
    path = tmp_path / "feed.jsonl"
    path.write_text('{"source": [1.0,')       # incomplete, no newline
    feed = PoseFeed.open(str(path))
    p = base_params()
    feed.params(p, 0)                          # must NOT error or apply
    with open(path, "a") as fh:
        fh.write(' 2.0]}\n')
    np.testing.assert_array_equal(np.asarray(feed.params(p, 1).source),
                                  [1.0, 2.0])


def test_regular_file_tailed_in_binary_mode(tmp_path):
    # Regression (round-5 soak): tailing a growing REGULAR file through
    # a text-mode read() can silently drop the bytes between two polls
    # (CPython's text layer caches a decoder snapshot at EOF) — a
    # 10-minute live session crashed on a torn line whose head vanished
    # while the file on disk was intact. The fix is mechanical: regular
    # files are opened unbuffered binary, so pin that mechanism.
    path = tmp_path / "feed.jsonl"
    path.write_text("")
    feed = PoseFeed.open(str(path))
    assert isinstance(feed._fh.read(0), bytes)
    assert feed._select_fd is None            # still EOF-tail, no select

    # soak-shaped stress: hundreds of polls over a file that grows by a
    # torn boundary each time (every line is appended in two pieces,
    # with a poll in between seeing the bare partial head)
    p = base_params()
    with open(path, "a") as fh:
        for i in range(300):
            line = json.dumps({"source": [float(i), 9.0]}) + "\n"
            cut = 1 + (i * 7) % (len(line) - 2)
            fh.write(line[:cut])
            fh.flush()
            feed.params(p, 2 * i)             # mid-line poll
            fh.write(line[cut:])
            fh.flush()
            got = feed.params(p, 2 * i + 1)   # completed-line poll
            np.testing.assert_array_equal(np.asarray(got.source),
                                          [float(i), 9.0])


def test_late_line_applies_at_next_poll(tmp_path):
    # a line stamped for a chunk that already played still applies (live
    # feeds are late by nature)
    feed, _ = feed_from(tmp_path, [{"chunk": 2, "source": [9.0, 9.0]}])
    p = feed.params(base_params(), 7)
    np.testing.assert_array_equal(np.asarray(p.source), [9.0, 9.0])


@pytest.mark.parametrize("line,match", [
    ("not json at all", "invalid JSON"),
    ('{"sorce": [1, 2]}', "unknown key"),
    ('{"chunk": -1, "source": [1, 2]}', "chunk"),
    ('{"chunk": 0}', "no override"),
    ('{"source": [1]}', "source"),
    ('{"source": [1, "a"]}', "source"),
    ('{"facing": true}', "facing"),
    ('{"listener": [1e999, 0]}', "non-finite"),
    ('[1, 2]', "JSON object"),
])
def test_malformed_lines_error_cleanly(tmp_path, line, match):
    path = tmp_path / "bad.jsonl"
    path.write_text(line + "\n")
    feed = PoseFeed.open(str(path))
    with pytest.raises(PoseFeedError, match=match):
        feed.params(base_params(), 0)


def test_lookahead_poll_does_not_leak_future_override(tmp_path):
    # the Doppler rate lookahead calls params_fn(i + 1) BEFORE chunk i
    # is traced; polling at i + 1 must not apply a chunk-(i+1) override
    # into chunk i's trace (round-4 review finding)
    feed, _ = feed_from(tmp_path, [{"chunk": 5, "source": [1.0, 2.0]}])
    p = base_params()
    feed.params(p, 5)                    # lookahead while producing 4
    p4 = feed.params(p, 4)
    np.testing.assert_array_equal(np.asarray(p4.source),
                                  np.asarray(p.source))
    np.testing.assert_array_equal(np.asarray(feed.params(p, 5).source),
                                  [1.0, 2.0])


def test_single_source_nested_list_form(tmp_path):
    # the documented [[x, y], ...] form with count 1 must match a
    # single-source stream's (2,)-shaped params.source
    feed, _ = feed_from(tmp_path, [{"source": [[1.0, 2.0]]}])
    p = feed.params(base_params(), 0)
    assert np.asarray(p.source).shape == (2,)
    np.testing.assert_array_equal(np.asarray(p.source), [1.0, 2.0])


def test_shape_mismatch_errors(tmp_path):
    feed, _ = feed_from(tmp_path, [
        {"source": [[0.0, 0.0], [1.0, 1.0]]}])   # 2 sources into a
    with pytest.raises(PoseFeedError, match="source override shape"):
        feed.params(base_params(), 0)            # 1-source stream


# ---- parity: fed stream == equivalent params_fn stream ----------------------


def test_pose_feed_stream_equals_params_fn_stream(tmp_path):
    import dataclasses
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=256)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                       reverb_duration=0.2))
    eng = Engine(room.scene, cfg)
    sr = cfg.audio.sample_rate
    dry = jnp.asarray(noise_burst(0.25, sr, seed=1))
    src = np.asarray(room.source, np.float32)

    def moved(i):
        # the trajectory the feed encodes: source jumps at chunk 1
        return eng.params(src + (np.float32([0.5, 0.0]) if i >= 1
                                 else 0.0), room.listener)

    feed, _ = feed_from(tmp_path, [
        {"chunk": 1, "source": [float(src[0] + 0.5), float(src[1])]}])
    static = lambda i: eng.params(src, room.listener)     # noqa: E731
    fed = lambda i: feed.params(static(i), i)             # noqa: E731

    want = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                      .stream_clip(dry, moved, loop=False))
    got = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                     .stream_clip(dry, fed, loop=False))
    np.testing.assert_array_equal(got, want)
    # and the jump is audible vs the unfed stream
    plain = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                       .stream_clip(dry, static, loop=False))
    assert not np.array_equal(got, plain)


def test_pose_feed_doppler_stream_equals_params_fn_stream(tmp_path):
    # with doppler=True the DopplerFeed's rate lookahead polls the feed
    # at i + 1 while chunk i is being produced; the fed stream must
    # still equal the explicit params_fn stream sample for sample
    # (round-4 review: the lookahead used to apply chunk-(i+1)
    # overrides one chunk early)
    import dataclasses
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=256)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                       reverb_duration=0.2))
    eng = Engine(room.scene, cfg)
    sr = cfg.audio.sample_rate
    total = 4
    dry = jnp.asarray(noise_burst(0.25, sr, seed=1))
    src = np.asarray(room.source, np.float32)

    def moved(i):
        return eng.params(src + np.float32([0.4 * i, 0.0]),
                          room.listener)

    feed, _ = feed_from(tmp_path, [
        {"chunk": i,
         "source": [float(src[0] + 0.4 * i), float(src[1])]}
        for i in range(total)])
    static = lambda i: eng.params(src, room.listener)     # noqa: E731
    fed = lambda i: feed.params(static(i), i)             # noqa: E731

    want = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                      .stream_clip(dry, moved, loop=False,
                                   total_chunks=total, doppler=True))
    got = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                     .stream_clip(dry, fed, loop=False,
                                  total_chunks=total, doppler=True))
    np.testing.assert_array_equal(got, want)


def test_pose_feed_per_arrival_stream_equals_params_fn_stream(tmp_path):
    # per-arrival Doppler polls no lookahead (rates come from the IRs),
    # so the fed stream must be BYTE-identical to the explicit params_fn
    # stream — the steering and the per-path physics compose
    import dataclasses
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=256)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                       reverb_duration=0.2))
    eng = Engine(room.scene, cfg)
    sr = cfg.audio.sample_rate
    total = 4
    dry = jnp.asarray(noise_burst(0.25, sr, seed=1))
    src = np.asarray(room.source, np.float32)

    def moved(i):
        return eng.params(src + np.float32([0.3 * i, 0.0]),
                          room.listener)

    feed, _ = feed_from(tmp_path, [
        {"chunk": i,
         "source": [float(src[0] + 0.3 * i), float(src[1])]}
        for i in range(total)])
    static = lambda i: eng.params(src, room.listener)     # noqa: E731
    fed = lambda i: feed.params(static(i), i)             # noqa: E731

    want = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                      .stream_clip(dry, moved, loop=False,
                                   total_chunks=total,
                                   doppler="per_arrival"))
    got = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                     .stream_clip(dry, fed, loop=False,
                                  total_chunks=total,
                                  doppler="per_arrival"))
    np.testing.assert_array_equal(got, want)


# ---- CLI end to end ---------------------------------------------------------


def test_cli_stream_pose_feed(tmp_path, capsys):
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.2, 8000, seed=3), 8000)
    fed_wav = str(tmp_path / "fed.wav")
    plain_wav = str(tmp_path / "plain.wav")
    feed = tmp_path / "poses.jsonl"
    feed.write_text(json.dumps({"chunk": 1, "source": [-10.0, 5.0]})
                    + "\n")
    main(["stream", "--room", "smoll", *TINY, "--in", dry,
          "--out", plain_wav])
    main(["stream", "--room", "smoll", *TINY, "--in", dry,
          "--out", fed_wav, "--pose-feed", str(feed)])
    a, _ = read_wav(fed_wav)
    b, _ = read_wav(plain_wav)
    assert a.shape == b.shape
    assert not np.array_equal(a, b)      # the steering did something


def test_cli_stream_pose_feed_malformed_line_fails(tmp_path):
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.15, 8000, seed=3), 8000)
    feed = tmp_path / "poses.jsonl"
    feed.write_text('{"bogus": 1}\n')
    with pytest.raises(PoseFeedError, match="unknown key"):
        main(["stream", "--room", "smoll", *TINY, "--in", dry,
              "--out", str(tmp_path / "x.wav"), "--pose-feed", str(feed)])


def test_cli_live_pose_feed(tmp_path, capsys):
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.2, 8000, seed=3), 8000)
    out = str(tmp_path / "live.wav")
    feed = tmp_path / "poses.jsonl"
    feed.write_text(json.dumps({"chunk": 1, "listener": [2.0, -2.0]})
                    + "\n")
    main(["live", "--room", "smoll", *TINY, "--in", dry, "--out", out,
          "--duration", "0.3", "--pose-feed", str(feed)])
    assert os.path.exists(out)
    assert "live:" in capsys.readouterr().out


# ---- geometry steering + control verbs (round-5: the last reference
# interactivity deltas — RayTraceManager.cs:55-61,67,246-250) -----------------


def test_move_collider_changes_only_its_rows():
    from realisticaudioraytracing2d_tpu.models.scene import SceneBuilder
    room = art.rooms.smoll_room()
    b = room.builder
    assert [c.name for c in b.colliders] == [
        "Wall", "Wall (1)", "Wall (2)", "Wall (3)", "Wall (4)"]
    moved = b.move_collider(room.scene, "Wall (4)",
                            position=(-10.0, 6.0), angle=0.3)
    c = b.find_collider("Wall (4)")
    a0 = np.asarray(room.scene.a)
    a1 = np.asarray(moved.a)
    rows = slice(c.start, c.start + c.count)
    assert not np.allclose(a0[rows], a1[rows])
    outside = np.ones(len(a0), bool)
    outside[rows] = False
    np.testing.assert_array_equal(a0[outside], a1[outside])
    # same padded wall count and materials: no recompile, no band change
    assert moved.n_walls == room.scene.n_walls
    np.testing.assert_array_equal(np.asarray(moved.absorption),
                                  np.asarray(room.scene.absorption))
    # by index works too, and matches the by-name result
    moved_i = b.move_collider(room.scene, 4, position=(-10.0, 6.0),
                              angle=0.3)
    np.testing.assert_array_equal(np.asarray(moved_i.a), a1)


def test_move_collider_partial_override_falls_back_to_authored():
    room = art.rooms.smoll_room()
    b = room.builder
    # angle-only: position stays the authored one — equals a full
    # move_collider with the authored position spelled out
    c = b.find_collider("Wall (4)")
    only_angle = b.move_collider(room.scene, "Wall (4)", angle=1.0)
    both = b.move_collider(room.scene, "Wall (4)",
                           position=c.transform.position, angle=1.0)
    np.testing.assert_array_equal(np.asarray(only_angle.a),
                                  np.asarray(both.a))


def test_move_collider_unknown_name_lists_known():
    room = art.rooms.smoll_room()
    with pytest.raises(KeyError, match="Wall \\(4\\)"):
        room.builder.move_collider(room.scene, "Door")


def test_pose_feed_obstacle_stream_equals_scene_fn_stream(tmp_path):
    # VERDICT r5 task 3 done-condition: fed geometry run byte-identical
    # to the equivalent explicit scene_fn run
    import dataclasses
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=256)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                       reverb_duration=0.2))
    eng = Engine(room.scene, cfg)
    dry = jnp.asarray(noise_burst(0.25, 8000, seed=1))
    params = eng.params(room.source, room.listener)
    fn = lambda i: params                                  # noqa: E731
    moved_scene = room.builder.move_collider(
        room.scene, "Wall (4)", position=(-9.0, 5.0), angle=0.2)

    def scene_fn(i):
        return moved_scene if i >= 1 else room.scene

    feed, _ = feed_from(tmp_path, [
        {"chunk": 1, "obstacle": "Wall (4)", "position": [-9.0, 5.0],
         "angle": 0.2}])
    feed.bind_scene(room.builder)
    fed_scene = lambda i: feed.scene(room.scene, i)        # noqa: E731

    want = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                      .stream_clip(dry, fn, scene_fn=scene_fn,
                                   loop=False))
    got = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                     .stream_clip(dry, fn, scene_fn=fed_scene,
                                  loop=False))
    np.testing.assert_array_equal(got, want)
    plain = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                       .stream_clip(dry, fn, loop=False))
    assert not np.array_equal(got, plain)   # the wall move is audible


def test_pose_feed_stop_flushes_tail(tmp_path):
    import dataclasses
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=256)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                       reverb_duration=0.2))
    eng = Engine(room.scene, cfg)
    n = cfg.audio.chunk_samples
    dry = jnp.asarray(noise_burst(1.0, 8000, seed=1))      # 10 chunks
    params = eng.params(room.source, room.listener)
    fn = lambda i: params                                  # noqa: E731
    feed, _ = feed_from(tmp_path, [{"chunk": 3, "command": "stop"}])
    got = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                     .stream_clip(dry, fn, loop=False,
                                  control_fn=feed.control))
    # stopped at chunk 3 + 2 tail chunks (0.2 s reverb / 0.1 s chunks)
    tail_chunks = (cfg.audio.ir_length + n - 1) // n
    assert got.shape[-1] == (3 + tail_chunks) * n
    # the tail region holds decaying reverb of the pre-stop audio
    tail = got[0, 3 * n:]
    assert np.abs(tail).max() > 0
    # and it decays: last 10% is much quieter than the first 10%
    head_rms = np.sqrt(np.mean(tail[:n // 4] ** 2))
    end_rms = np.sqrt(np.mean(tail[-n // 4:] ** 2))
    assert end_rms < 0.5 * head_rms


def test_pose_feed_reset_ir_cuts_the_crossfade_memory(tmp_path):
    import dataclasses
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=256)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                       reverb_duration=0.2))
    eng = Engine(room.scene, cfg)
    n = cfg.audio.chunk_samples
    dry = jnp.asarray(noise_burst(0.4, 8000, seed=1))
    params = eng.params(room.source, room.listener)
    fn = lambda i: params                                  # noqa: E731
    feed, _ = feed_from(tmp_path, [{"chunk": 2, "command": "reset_ir"}])
    got = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                     .stream_clip(dry, fn, loop=False,
                                  control_fn=feed.control))
    plain = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                       .stream_clip(dry, fn, loop=False))
    assert got.shape == plain.shape
    # chunks before the reset are identical; the reset chunk differs
    # (its crossfade now fades in from a zero IR)
    np.testing.assert_array_equal(got[:, :2 * n], plain[:, :2 * n])
    assert not np.array_equal(got[:, 2 * n:3 * n],
                              plain[:, 2 * n:3 * n])


def test_pose_feed_obstacle_errors_name_the_line(tmp_path):
    room = art.rooms.smoll_room()
    feed, _ = feed_from(tmp_path, [
        {"source": [1.0, 1.0]},
        {"obstacle": "Door", "position": [1.0, 1.0]}])
    feed.bind_scene(room.builder)
    with pytest.raises(PoseFeedError, match="line 2.*Door"):
        feed.scene(room.scene, 0)
    # obstacle line without position/angle is rejected at parse
    feed2, _ = feed_from(tmp_path, [{"obstacle": "Wall"}], name="f2.jsonl")
    with pytest.raises(PoseFeedError, match="position.*angle|angle"):
        feed2.params(base_params(), 0)
    # obstacle line on a feed with no steerable scene bound
    feed3, _ = feed_from(tmp_path, [
        {"obstacle": "Wall", "angle": 0.1}], name="f3.jsonl")
    with pytest.raises(PoseFeedError, match="no steerable scene"):
        feed3.scene(room.scene, 0)
    # position/angle without an obstacle is rejected at parse
    feed4, _ = feed_from(tmp_path, [{"position": [0.0, 0.0]}],
                         name="f4.jsonl")
    with pytest.raises(PoseFeedError, match="obstacle"):
        feed4.params(base_params(), 0)
    # unknown command
    feed5, _ = feed_from(tmp_path, [{"command": "pause"}],
                         name="f5.jsonl")
    with pytest.raises(PoseFeedError, match="unknown command"):
        feed5.params(base_params(), 0)


def test_long_session_folding_bounds_state(tmp_path):
    # VERDICT r4 weak #2: a chatty feed must not grow per-chunk poll
    # cost or memory. 10^4 held lines fold into the constant-size base;
    # only not-yet-due lines stay pending.
    lines = [{"chunk": i, "source": [float(i % 7), 0.0]}
             for i in range(10000)]
    lines.append({"chunk": 10500, "source": [42.0, 0.0]})
    feed, _ = feed_from(tmp_path, lines)
    p = base_params()
    feed.params(p, 0)            # ingest everything
    for q in range(9990, 10010):
        feed.params(p, q)
    # everything due has folded; only the far-future line is pending
    assert len(feed._pending) == 1
    # and the folded hold is correct
    got = feed.params(p, 10010)
    np.testing.assert_array_equal(np.asarray(got.source),
                                  [float(9999 % 7), 0.0])
    got = feed.params(p, 10500)
    np.testing.assert_array_equal(np.asarray(got.source), [42.0, 0.0])


def test_facing_override_on_non_binaural_stream_warns(tmp_path):
    # VERDICT r4 weak #4: a well-formed facing override must not no-op
    # silently on a non-binaural stream
    import argparse
    import warnings as _w
    from realisticaudioraytracing2d_tpu.cli import _pose_feed_wrap
    path = tmp_path / "f.jsonl"
    path.write_text(json.dumps({"facing": 0.5}) + "\n")
    args = argparse.Namespace(pose_feed=str(path))
    room = art.rooms.smoll_room()
    poses, facing_fn, scene_fn, control_fn = _pose_feed_wrap(
        args, lambda i: base_params(), None, room=room, binaural=False)
    assert facing_fn is None
    with pytest.warns(UserWarning, match="not binaural"):
        poses(0)
    with _w.catch_warnings():
        _w.simplefilter("error")          # warned ONCE, not per chunk
        poses(1)


def test_cli_stream_pose_feed_obstacle_and_stop(tmp_path):
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.5, 8000, seed=3), 8000)
    out = str(tmp_path / "steered.wav")
    feed = tmp_path / "feed.jsonl"
    feed.write_text(
        json.dumps({"chunk": 1, "obstacle": "Wall (4)",
                    "position": [-9.0, 5.0]}) + "\n"
        + json.dumps({"chunk": 3, "command": "stop"}) + "\n")
    main(["stream", "--room", "smoll", *TINY, "--in", dry, "--out", out,
          "--pose-feed", str(feed)])
    x, sr = read_wav(out)
    # stopped at chunk 3 (+0.2 s tail at 0.1 s chunks = 2 chunks)
    assert x.shape[0] == 5 * 800
    assert np.abs(x).max() > 0


def test_live_stop_verb_shrinks_the_run(tmp_path):
    import dataclasses
    from realisticaudioraytracing2d_tpu.live import LivePlayer
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=256)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                       reverb_duration=0.2))
    eng = Engine(room.scene, cfg)
    n = cfg.audio.chunk_samples
    params = eng.params(room.source, room.listener)
    dry = jnp.asarray(noise_burst(0.8, 8000, seed=1))
    feed, _ = feed_from(tmp_path, [{"chunk": 2, "command": "stop"}])
    rep = LivePlayer(room.scene, cfg, jax.random.PRNGKey(0)).run(
        dry, total_chunks=8, loop=False, realtime=False, params=params,
        control_fn=feed.control)
    tail_chunks = (cfg.audio.ir_length + n - 1) // n
    assert rep.chunks == 2 + tail_chunks
    assert rep.audio.shape[-1] == (2 + tail_chunks) * n
    assert np.abs(rep.audio).max() > 0


def test_live_obstacle_steering_equals_scene_fn(tmp_path):
    import dataclasses
    from realisticaudioraytracing2d_tpu.live import LivePlayer
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=256)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                       reverb_duration=0.2))
    eng = Engine(room.scene, cfg)
    params = eng.params(room.source, room.listener)
    dry = jnp.asarray(noise_burst(0.3, 8000, seed=1))
    moved = room.builder.move_collider(room.scene, "Wall (4)",
                                       position=(-9.0, 5.0))
    feed, _ = feed_from(tmp_path, [
        {"chunk": 1, "obstacle": "Wall (4)", "position": [-9.0, 5.0]}])
    feed.bind_scene(room.builder)
    rep = LivePlayer(room.scene, cfg, jax.random.PRNGKey(0)).run(
        dry, total_chunks=3, loop=False, realtime=False, params=params,
        scene_fn=lambda i: feed.scene(room.scene, i))
    want = LivePlayer(room.scene, cfg, jax.random.PRNGKey(0)).run(
        dry, total_chunks=3, loop=False, realtime=False, params=params,
        scene_fn=lambda i: moved if i >= 1 else room.scene)
    np.testing.assert_array_equal(rep.audio, want.audio)
