"""Live pipeline tests: sim-clock producer + real audio-clock consumer
thread against the native ring buffer — the ``AudioManager`` contract
(``AudioManager.cs:45-69``) exercised producer/consumer-style instead of
single-threaded."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.live import LivePlayer
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams
from realisticaudioraytracing2d_tpu.streaming import Streamer


@pytest.fixture(scope="module")
def live_cfg():
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=512)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, reverb_duration=0.1,
                                       chunk_duration=0.05))
    params = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    return room, cfg, params


def test_live_threaded_matches_single_threaded_stream(live_cfg):
    # Integrity mode: the audio thread's concatenated drains must equal
    # the single-threaded stream_clip output sample for sample (the
    # overlap-add frontier logic loses nothing across the thread handoff).
    room, cfg, params = live_cfg
    n = cfg.audio.chunk_samples
    total = 6
    dry = jnp.asarray(np.random.default_rng(0).normal(
        size=3 * n).astype(np.float32) * 0.3)

    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(1))
    rep = player.run(dry, total_chunks=total, loop=False, realtime=False,
                     params=params)
    assert rep.underruns == 0
    assert rep.chunks == total
    assert rep.audio.shape == (1, total * n)

    streamer = Streamer(room.scene, cfg, jax.random.PRNGKey(1))
    ref = np.asarray(streamer.stream_clip(dry, lambda i: params,
                                          loop=False, total_chunks=total))
    np.testing.assert_allclose(rep.audio, ref, atol=1e-6)
    assert np.abs(rep.audio).max() > 0


def test_live_record_false_drops_audio_keeps_accounting(live_cfg):
    # record=False is the open-ended-session mode (the soak's flat-RSS
    # guard): the report must lose ONLY the audio — chunk/callback/
    # underrun accounting identical to a recorded run of the same seed.
    room, cfg, params = live_cfg
    n = cfg.audio.chunk_samples
    total = 4
    dry = jnp.asarray(np.random.default_rng(0).normal(
        size=2 * n).astype(np.float32) * 0.3)

    runs = {}
    for record in (True, False):
        player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(1))
        runs[record] = player.run(dry, total_chunks=total, loop=False,
                                  realtime=False, params=params,
                                  record=record)
    assert runs[True].audio.shape == (1, total * n)
    assert runs[False].audio.shape == (1, 0)
    for field in ("chunks", "callbacks", "underruns", "max_lead_samples"):
        assert getattr(runs[False], field) == getattr(runs[True], field)


def test_live_dsp_buffer_cadence(live_cfg):
    # Drains happen at DSP-buffer granularity (1024 samples, the
    # reference's m_DSPBufferSize): callback count is ceil(total/1024).
    room, cfg, params = live_cfg
    n = cfg.audio.chunk_samples
    total = 4
    dry = jnp.asarray(np.random.default_rng(2).normal(
        size=2 * n).astype(np.float32) * 0.3)
    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(0),
                        dsp_buffer=1024)
    rep = player.run(dry, total_chunks=total, loop=False, realtime=False,
                     params=params)
    assert rep.callbacks == -(-total * n // 1024)
    assert rep.underruns == 0


def test_live_backpressure_tight_ring_stays_lossless(live_cfg):
    # Regression: a producer that runs far ahead of the consumer must
    # block on ring capacity, not wrap around and overlap-add on top of
    # undrained audio. With a ring barely larger than one chunk+tail, a
    # fast producer without backpressure corrupts nearly every sample.
    room, cfg, params = live_cfg
    n = cfg.audio.chunk_samples
    t = cfg.audio.ir_length
    total = 8
    dry = jnp.asarray(np.random.default_rng(7).normal(
        size=3 * n).astype(np.float32) * 0.3)

    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(1),
                        dsp_buffer=512, ring_size=n + t + 512 + 64)
    # realtime: the consumer is wall-clock paced while the (jit-warmed)
    # producer runs much faster, so it slams into the ring-capacity cap
    rep = player.run(dry, total_chunks=total, loop=False, realtime=True,
                     params=params)
    if rep.underruns or rep.max_lead_samples < n:
        pytest.skip("producer did not outpace the audio clock here")
    assert rep.late_samples == 0
    streamer = Streamer(room.scene, cfg, jax.random.PRNGKey(1))
    ref = np.asarray(streamer.stream_clip(dry, lambda i: params,
                                          loop=False, total_chunks=total))
    np.testing.assert_allclose(rep.audio, ref, atol=1e-6)


def test_live_ring_size_floor_enforced(live_cfg):
    room, cfg, _ = live_cfg
    with pytest.raises(ValueError, match="ring_size"):
        LivePlayer(room.scene, cfg, jax.random.PRNGKey(0), ring_size=64)


def test_live_realtime_mode_counts_underruns_not_crashes(live_cfg):
    # Wall-clock pacing with an artificially slow producer: the consumer
    # keeps its cadence, reports underruns, and the run still completes.
    room, cfg, params = live_cfg
    n = cfg.audio.chunk_samples

    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(0),
                        dsp_buffer=max(256, n // 4))
    slow_params = params

    calls = []

    def slow_fn(i):
        import time
        if i > 0:
            time.sleep(0.2)  # slower than the 0.05 s chunk cadence
        calls.append(i)
        return slow_params

    dry = jnp.asarray(np.random.default_rng(3).normal(
        size=2 * n).astype(np.float32) * 0.3)
    rep = player.run(dry, total_chunks=4, loop=False, realtime=True,
                     params_fn=slow_fn)
    assert rep.chunks == 4
    assert rep.underruns > 0          # producer demonstrably outrun
    assert rep.audio.shape[-1] == 4 * n
    assert "underruns" in rep.summary()


def test_live_doppler_matches_doppler_stream(live_cfg):
    # Doppler live (threaded, integrity mode) == the Doppler Streamer
    # output sample-exact: both feed the producer through the shared
    # DopplerFeed rate derivation (round-3 VERDICT gap: live fed plain
    # dry_chunks, so live and stream disagreed on physics for the same
    # moving pose)
    room, cfg, params = live_cfg
    n = cfg.audio.chunk_samples
    total = 6
    sr = cfg.audio.sample_rate
    t = np.arange(3 * n) / sr
    dry = jnp.asarray(np.sin(2 * np.pi * 400.0 * t).astype(np.float32)
                      * 0.4)
    src = np.asarray(room.source, np.float32)
    lis = np.asarray(room.listener, np.float32).reshape(-1)[:2]
    u = (src - lis) / np.linalg.norm(src - lis)
    v, chunk_dt = 34.3, cfg.audio.chunk_duration

    def poses(i):
        # source receding along the source->listener axis at 0.1c
        return params._replace(
            source=jnp.asarray(src + u * (v * chunk_dt * i), jnp.float32))

    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(1))
    rep = player.run(dry, total_chunks=total, loop=False, realtime=False,
                     params_fn=poses, doppler=True)
    assert rep.underruns == 0

    streamer = Streamer(room.scene, cfg, jax.random.PRNGKey(1))
    want = np.asarray(streamer.stream_clip(
        dry, poses, loop=False, total_chunks=total, doppler=True))
    # (atol matches the other live==stream parity tests: the two paths
    # are separately compiled programs — device ring vs host ring)
    np.testing.assert_allclose(rep.audio, want[:, :rep.audio.shape[-1]],
                               atol=1e-6)
    # and it differs from the Doppler-free live run (the shift is real)
    plain = LivePlayer(room.scene, cfg, jax.random.PRNGKey(1)).run(
        dry, total_chunks=total, loop=False, realtime=False,
        params_fn=poses)
    assert not np.allclose(rep.audio, plain.audio)


def test_live_sink_receives_every_drained_buffer(live_cfg):
    # a sink (the AudioSink contract: write(block[C, N])) gets exactly
    # the audio the thread drained, in order - so on a host with ALSA,
    # --play plays precisely what the report records
    room, cfg, params = live_cfg
    n = cfg.audio.chunk_samples
    total = 4
    dry = jnp.asarray(np.random.default_rng(0).normal(
        size=2 * n).astype(np.float32) * 0.3)

    class FakeSink:
        def __init__(self):
            self.blocks = []

        def write(self, block):
            self.blocks.append(np.array(block, np.float32))
            return block.shape[-1]

    sink = FakeSink()
    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(1))
    rep = player.run(dry, total_chunks=total, loop=False, realtime=False,
                     params=params, sink=sink)
    got = np.concatenate(sink.blocks, axis=-1)
    np.testing.assert_array_equal(got, rep.audio)


def test_live_sink_underrun_paces_with_silence_not_spin(live_cfg):
    # realtime + device sink + a producer that can't keep up: every
    # skipped tick must write ONE DSP period of silence to the device
    # (whose blocking write paces the loop) instead of busy-spinning
    # with no write at all — so sink writes > drained callbacks, and
    # underruns count periods, not spin iterations (round-4 review
    # finding: the skip path had no sleep/write with a sink attached)
    import time

    room, cfg, params = live_cfg
    n = cfg.audio.chunk_samples
    sr = cfg.audio.sample_rate
    total = 3
    dsp = n // 2
    period = dsp / sr
    dry = jnp.asarray(np.random.default_rng(0).normal(
        size=2 * n).astype(np.float32) * 0.3)

    def slow_params(i):
        time.sleep(4 * period)   # guarantee the producer falls behind
        return params

    class BlockingSink:
        def __init__(self):
            self.writes = 0

        def write(self, block):
            assert block.shape[-1] == dsp
            self.writes += 1
            time.sleep(block.shape[-1] / sr)   # a real device blocks
            return block.shape[-1]

    sink = BlockingSink()
    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(1),
                        dsp_buffer=dsp)
    rep = player.run(dry, total_chunks=total, loop=False, realtime=True,
                     params_fn=slow_params, sink=sink, prime=1)
    assert rep.underruns >= 1                 # the producer did lag
    assert sink.writes > rep.callbacks        # skipped ticks hit the device
    # one write per period: underruns can never exceed device writes
    # (the spin bug produced underruns >> writes)
    assert rep.underruns <= sink.writes


def test_cli_live_play_degrades_cleanly_without_alsa(tmp_path):
    from realisticaudioraytracing2d_tpu import native
    from realisticaudioraytracing2d_tpu.cli import main
    if native.sink_probe()[0]:
        pytest.skip("ALSA present here; degradation path not reachable")
    with pytest.raises(SystemExit, match="--play"):
        main(["live", "--room", "smoll", "--rays", "64", "--bounces", "4",
              "--frames", "1", "--reverb", "0.2", "--sample-rate", "8000",
              "--duration", "0.2", "--play"])


def test_live_binaural_matches_binaural_stream(live_cfg):
    # binaural live (threaded, integrity mode) == the binaural Streamer
    # output: the ear decode rides the same chunk step on both paths
    room, cfg, params = live_cfg
    n = cfg.audio.chunk_samples
    total = 5
    dry = jnp.asarray(np.random.default_rng(2).normal(
        size=3 * n).astype(np.float32) * 0.3)
    facing = lambda i: 0.3 * i  # noqa: E731

    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(1),
                        binaural=True)
    rep = player.run(dry, total_chunks=total, loop=False,
                     params=params, facing_fn=facing)
    assert rep.audio.shape[0] == 2

    streamer = Streamer(room.scene, cfg, jax.random.PRNGKey(1),
                        binaural=True)
    want = np.asarray(streamer.stream_clip(
        dry, lambda i: params, total_chunks=total, loop=False,
        facing_fn=facing))
    m = rep.audio.shape[-1]
    assert m > 0
    np.testing.assert_allclose(rep.audio, want[:, :m], atol=1e-6)
    # the rotating head lateralizes: ears differ
    assert not np.allclose(rep.audio[0], rep.audio[1])
