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
