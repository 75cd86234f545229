"""On-chip pipeline tests (round-3 VERDICT #5): the 60 Hz product loop —
chunked streaming, the live producer/consumer, and checkpoint resume —
asserted on the real TPU through the production (fused-kernel) routing,
not just benched.

Reference contract: the ``FixedUpdate`` chunk clock + ``ProcessChunk``
dispatch (``RayTraceManager.cs:64-123``) must sustain realtime at the
reference workload (15k rays x 5 bounces, 48 kHz, 1.5 s reverb, 0.1 s
chunks) while the chunked overlap-add output stays exactly the sum of
its per-chunk convolutions.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.engine import Engine, trace_accumulate
from realisticaudioraytracing2d_tpu.live import LivePlayer
from realisticaudioraytracing2d_tpu.ops import ir as irm
from realisticaudioraytracing2d_tpu.ops import rng as _rng
from realisticaudioraytracing2d_tpu.streaming import (Streamer,
                                                      _crossfaded_wet)
from realisticaudioraytracing2d_tpu.utils.audio_io import noise_burst


@pytest.fixture(scope="module")
def ref_setup():
    """The reference workload, unchanged: smoll_room_config defaults."""
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config()
    eng = Engine(room.scene, cfg)
    params = eng.params(room.source, room.listener)
    return room, cfg, params


def test_chunked_stream_matches_per_chunk_reconstruction(ref_setup):
    """Chunked == bake-style reconstruction through the mega path: the
    streamer's ring output must equal the host overlap-add of the same
    per-chunk crossfaded convolutions, with per-chunk IRs recomputed via
    the SAME production routing (backend='auto' -> fused kernel) and the
    same chunk keys — so any drift in ring indexing, crossfade ramps, or
    state donation on chip shows up as a mismatch."""
    room, cfg, params = ref_setup
    sr = cfg.audio.sample_rate
    n = cfg.audio.chunk_samples
    t = cfg.audio.ir_length
    total = 4
    key = jax.random.PRNGKey(11)
    dry = jnp.asarray(noise_burst(total * n / sr, sr, seed=5))

    streamer = Streamer(room.scene, cfg, key)
    wet_stream = np.asarray(streamer.stream_clip(
        dry, lambda i: params, loop=False, total_chunks=total))[0]
    assert wet_stream.shape == (total * n,)
    assert np.abs(wet_stream).max() > 0

    # Host reconstruction from on-chip per-chunk IRs (identical keys ->
    # identical fused-kernel IRs; stream_chunk derives chunk_key =
    # frame_key(key, chunk_index)).
    def chunk_ir(i):
        st = trace_accumulate(
            room.scene, params, irm.IRState.zeros(t, 1, 1),
            _rng.frame_key(key, i), n_rays=cfg.sim.ray_count,
            max_bounces=cfg.sim.max_bounces, sample_rate=sr, n_frames=1)
        return st.normalized()                          # [1, T, 1]

    acc = np.zeros(total * n + n + t)
    prev = None
    for i in range(total):
        cur = chunk_ir(i)
        piece = dry[i * n:(i + 1) * n]
        wet = np.asarray(_crossfaded_wet(
            piece[None, :], cur if prev is None else prev, cur))[0]
        acc[i * n:i * n + len(wet)] += wet
        prev = cur
    np.testing.assert_allclose(wet_stream, acc[:total * n],
                               rtol=2e-3, atol=2e-5)


def test_live_realtime_reference_workload_no_underruns(ref_setup):
    """The north-star loop: at the reference workload the live producer
    must beat the audio clock on chip — a wall-clock-paced consumer
    drains 1024-sample DSP buffers and never outruns the producer."""
    room, cfg, params = ref_setup
    sr = cfg.audio.sample_rate
    n = cfg.audio.chunk_samples
    dry = jnp.asarray(noise_burst(1.0, sr, seed=7))

    # Warm-up: compile wet_chunk outside the timed run (one chunk,
    # integrity mode). Uses its own player so ring state doesn't leak.
    warm = LivePlayer(room.scene, cfg, jax.random.PRNGKey(3))
    warm.run(dry, total_chunks=1, loop=False, realtime=False,
             params=params)

    player = LivePlayer(room.scene, cfg, jax.random.PRNGKey(3))
    total = 10                                   # 1 s of audio
    rep = player.run(dry, total_chunks=total, loop=False, realtime=True,
                     params=params)
    assert rep.chunks == total
    assert rep.underruns == 0, rep.summary()
    assert rep.realtime_factor > 1.0, rep.summary()
    assert rep.audio.shape[-1] == total * n
    assert np.abs(rep.audio).max() > 0


def test_checkpoint_resume_on_chip(ref_setup, tmp_path):
    """Preemption recovery of a TPU accumulation: save after 4 frames,
    reload, resume 4 more (the CLI's --ir-in/--ir-out contract). The
    round-trip must be bit-exact and the resumed 8-frame average must
    statistically match a one-shot 8-frame run (different frame seed
    streams — fold_in(key, 4) restart — same Monte-Carlo estimate)."""
    from realisticaudioraytracing2d_tpu.utils.checkpoint import (
        load_ir_state, save_ir_state)
    room, cfg, params = ref_setup
    sr = cfg.audio.sample_rate
    t = cfg.audio.ir_length
    key = jax.random.PRNGKey(21)
    kw = dict(n_rays=cfg.sim.ray_count, max_bounces=cfg.sim.max_bounces,
              sample_rate=sr)

    half = trace_accumulate(room.scene, params, irm.IRState.zeros(t, 1, 1),
                            key, n_frames=4, **kw)
    path = str(tmp_path / "ckpt.npz")
    save_ir_state(path, half)
    loaded = load_ir_state(path)
    assert int(loaded.frames) == 4
    np.testing.assert_array_equal(np.asarray(half.sum),
                                  np.asarray(loaded.sum))

    resumed = trace_accumulate(room.scene, params, loaded,
                               jax.random.fold_in(key, 4), n_frames=4,
                               **kw)
    oneshot = trace_accumulate(room.scene, params,
                               irm.IRState.zeros(t, 1, 1), key,
                               n_frames=8, **kw)
    assert int(resumed.frames) == int(oneshot.frames) == 8
    ir_r = np.asarray(resumed.normalized())[0, :, 0]
    ir_o = np.asarray(oneshot.normalized())[0, :, 0]
    assert abs(ir_r.sum() - ir_o.sum()) / ir_o.sum() < 0.05
    # geometry (first arrival) is seed-independent
    assert abs(int(np.nonzero(ir_r > 1e-7)[0][0])
               - int(np.nonzero(ir_o > 1e-7)[0][0])) <= 4


def test_per_arrival_doppler_stream_on_chip():
    # the per-arrival Doppler chunk step (arrival top_k + mutual match +
    # gliding 3-bin taps + residual conv, streaming._per_arrival_parts)
    # composes with the fused-kernel retrace on the real chip: on the
    # compact two-arrival fixture (tests/test_doppler_arrivals.py) a
    # static pose renders the same audio as the plain stream — the taps
    # carry their exact windows; deviation is bounded MC tap jitter.
    # (SmollRoom's wall-mediated arrivals are spread plateaus whose
    # local maxima jitter with MC noise — docs/ACOUSTICS.md limits.)
    from realisticaudioraytracing2d_tpu.models.materials import (
        AudioMaterial)
    from realisticaudioraytracing2d_tpu.models.scene import (SceneBuilder,
                                                             Transform2D)
    mirror = AudioMaterial(absorption=0.0, scattering=0.0,
                           transmission=0.0, ior=1.0)
    b = SceneBuilder()
    b.add_box(mirror, Transform2D(position=(6.5, 0.0)), size=(1.0, 2.0))
    scene = b.build()
    cfg = art.smoll_room_config(ray_count=2048)
    cfg = dataclasses.replace(
        cfg,
        sim=dataclasses.replace(cfg.sim, listener_radius=0.05),
        audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                  reverb_duration=0.15,
                                  chunk_duration=0.1))
    eng = Engine(scene, cfg)
    params = eng.params(np.asarray([2.0, 0.0], np.float32),
                        np.asarray([0.0, 0.0], np.float32))
    sr = cfg.audio.sample_rate
    n = cfg.audio.chunk_samples
    dry = jnp.asarray(noise_burst(0.35, sr, seed=5))
    fn = lambda i: params                                 # noqa: E731
    plain = np.asarray(Streamer(scene, cfg, jax.random.PRNGKey(2),
                                frames_per_chunk=4)
                       .stream_clip(dry, fn, loop=False,
                                    total_chunks=4))
    pa = np.asarray(Streamer(scene, cfg, jax.random.PRNGKey(2),
                             frames_per_chunk=4)
                    .stream_clip(dry, fn, loop=False, total_chunks=4,
                                 doppler="per_arrival"))
    assert pa.shape == plain.shape
    assert np.isfinite(pa).all()
    scale = np.abs(plain).max()
    np.testing.assert_allclose(pa[:, :n], plain[:, :n],
                               atol=1e-4 * scale)      # chunk 0: exact
    num = np.linalg.norm(pa - plain)
    assert num / np.linalg.norm(plain) < 0.05


def test_binaural_per_arrival_stream_on_chip():
    # round-5 flagship composition on the real chip: binaural (3-mic
    # spatial capture through the fused kernel + ITD/ILD decode) x
    # per-arrival Doppler (W-channel taps with per-ear glides). Static
    # pose => matches the plain binaural stream (the ear taps reproduce
    # the removed decode deposits exactly); the moving case is covered
    # spectrally on CPU (tests/test_doppler_arrivals.py).
    from realisticaudioraytracing2d_tpu.models.materials import (
        AudioMaterial)
    from realisticaudioraytracing2d_tpu.models.scene import (SceneBuilder,
                                                             Transform2D)
    mirror = AudioMaterial(absorption=0.0, scattering=0.0,
                           transmission=0.0, ior=1.0)
    b = SceneBuilder()
    b.add_box(mirror, Transform2D(position=(6.5, 0.0)), size=(1.0, 2.0))
    scene = b.build()
    cfg = art.smoll_room_config(ray_count=2048)
    cfg = dataclasses.replace(
        cfg,
        sim=dataclasses.replace(cfg.sim, listener_radius=0.05),
        audio=dataclasses.replace(cfg.audio, sample_rate=8000,
                                  reverb_duration=0.15,
                                  chunk_duration=0.1))
    eng = Engine(scene, cfg)
    params = eng.params(np.asarray([2.0, 0.0], np.float32),
                        np.asarray([0.0, 0.0], np.float32))
    sr = cfg.audio.sample_rate
    n = cfg.audio.chunk_samples
    dry = jnp.asarray(noise_burst(0.35, sr, seed=5))
    fn = lambda i: params                                 # noqa: E731
    facing = lambda i: 0.7                                # noqa: E731
    plain = np.asarray(
        Streamer(scene, cfg, jax.random.PRNGKey(2), frames_per_chunk=4,
                 binaural=True)
        .stream_clip(dry, fn, loop=False, total_chunks=4,
                     facing_fn=facing))
    pa = np.asarray(
        Streamer(scene, cfg, jax.random.PRNGKey(2), frames_per_chunk=4,
                 binaural=True)
        .stream_clip(dry, fn, loop=False, total_chunks=4,
                     doppler="per_arrival", facing_fn=facing))
    assert pa.shape == plain.shape and pa.shape[0] == 2
    assert np.isfinite(pa).all()
    scale = np.abs(plain).max()
    np.testing.assert_allclose(pa[:, :n], plain[:, :n],
                               atol=2e-4 * scale)      # chunk 0: exact
    num = np.linalg.norm(pa - plain)
    assert num / np.linalg.norm(plain) < 0.05
    # the ears differ (ITD/ILD + decorrelated diffuse are real)
    assert not np.array_equal(pa[0], pa[1])
