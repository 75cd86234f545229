"""Streaming pipeline tests: ring-buffer contract, crossfade, and
stream-vs-bake equivalence for a static scene."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.engine import Engine
from realisticaudioraytracing2d_tpu.ops import convolve as cv
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams
from realisticaudioraytracing2d_tpu.streaming import (RingBuffer, Streamer,
                                                      init_stream,
                                                      stream_chunk)
from realisticaudioraytracing2d_tpu.utils.audio_io import noise_burst


def test_ring_buffer_push_drain_roundtrip():
    rb = RingBuffer.zeros(16, 1)
    rb = rb.push(jnp.arange(1.0, 5.0)[None, :], jnp.asarray(0))
    out, rb = rb.drain(4)
    np.testing.assert_allclose(np.asarray(out)[0], [1, 2, 3, 4])
    # drained region is zeroed (add-then-zero contract)
    out2, rb = rb.drain(4)
    np.testing.assert_allclose(np.asarray(out2)[0], np.zeros(4))


def test_ring_buffer_overlap_add():
    rb = RingBuffer.zeros(8, 1)
    rb = rb.push(jnp.ones((1, 4)), jnp.asarray(0))
    rb = rb.push(jnp.ones((1, 4)), jnp.asarray(2))  # overlaps samples 2-3
    out, _ = rb.drain(6)
    np.testing.assert_allclose(np.asarray(out)[0], [1, 1, 2, 2, 1, 1])


def test_ring_buffer_wraparound():
    rb = RingBuffer.zeros(8, 1)
    rb = rb.push(jnp.ones((1, 6)), jnp.asarray(5))  # wraps 5,6,7,0,1,2
    got = np.asarray(rb.data)[0]
    np.testing.assert_allclose(got, [1, 1, 1, 0, 0, 1, 1, 1])


@pytest.fixture(scope="module")
def setup():
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=512)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, reverb_duration=0.2,
                                       chunk_duration=0.05))
    return room, cfg


def test_stream_static_scene_matches_bake(setup):
    """With a static scene and identical per-chunk IR keys, streamed output
    must equal the offline bake (crossfade between equal IRs == identity)."""
    room, cfg = setup
    sr = cfg.audio.sample_rate
    dry = jnp.asarray(noise_burst(0.18, sr, seed=1))

    eng = Engine(room.scene, cfg)
    p = eng.params(room.source, room.listener)
    streamer = Streamer(room.scene, cfg, jax.random.PRNGKey(0))
    wet_stream = np.asarray(streamer.stream_clip(dry, lambda i: p))[0]

    # Oracle: overlap-add of per-chunk crossfaded convolutions using the
    # same per-chunk IRs the streamer derives.
    n = cfg.audio.chunk_samples
    T = cfg.audio.ir_length
    from realisticaudioraytracing2d_tpu.ops import ir as irm
    from realisticaudioraytracing2d_tpu.ops.rng import frame_key
    from realisticaudioraytracing2d_tpu.ops.trace import trace_hits_only

    def chunk_ir(chunk_idx):
        # stream_chunk derives: fold_in(fold_in(key, chunk_idx), frame=0)
        k = frame_key(frame_key(jax.random.PRNGKey(0), chunk_idx), 0)
        hits = trace_hits_only(room.scene, p, k,
                               n_rays=cfg.sim.ray_count,
                               max_bounces=cfg.sim.max_bounces)
        st = irm.accumulate(irm.IRState.zeros(T, 1, 1), hits, sr)
        return st.normalized()[0, :, 0]

    total_chunks = int(np.ceil(dry.shape[0] / n)) + int(np.ceil(T / n))
    acc = np.zeros(total_chunks * n + T + n)
    prev = None
    for i in range(total_chunks):
        ir_i = np.asarray(chunk_ir(i))
        piece = np.asarray(dry[i * n:(i + 1) * n])
        piece = np.pad(piece, (0, n - len(piece)))
        pi = ir_i if prev is None else prev
        wet = np.asarray(cv.convolve_chunk_crossfade(
            jnp.asarray(piece), jnp.asarray(pi), jnp.asarray(ir_i), 1, 1))
        acc[i * n:i * n + len(wet)] += wet
        prev = ir_i
    np.testing.assert_allclose(wet_stream, acc[:len(wet_stream)],
                               rtol=2e-3, atol=2e-5)


def test_stream_moving_listener_runs_and_differs(setup):
    room, cfg = setup
    sr = cfg.audio.sample_rate
    dry = jnp.asarray(noise_burst(0.1, sr, seed=2))
    eng = Engine(room.scene, cfg)

    def moving(i):
        return eng.params(room.source,
                          room.listener + np.array([0.5 * i, 0.0],
                                                   np.float32))

    s1 = Streamer(room.scene, cfg, jax.random.PRNGKey(0))
    wet_moving = np.asarray(s1.stream_clip(dry, moving))
    s2 = Streamer(room.scene, cfg, jax.random.PRNGKey(0))
    wet_static = np.asarray(s2.stream_clip(
        dry, lambda i: eng.params(room.source, room.listener)))
    assert wet_moving.shape == wet_static.shape
    assert not np.allclose(wet_moving, wet_static)
    assert np.all(np.isfinite(wet_moving))


def test_stream_dynamic_scene_matches_oracle(setup):
    """Dynamic-scene oracle (completes the end-to-end oracle set): with a
    per-chunk moving obstacle AND moving listener, the streamed output
    must equal a host-side reconstruction — per-chunk retrace on that
    chunk's scene/pose, crossfaded dual-IR convolution, overlap-add
    (the dynamicObstacles mode, RayTraceManager.cs:67)."""
    room, cfg = setup
    sr = cfg.audio.sample_rate
    dry = jnp.asarray(noise_burst(0.15, sr, seed=3))
    eng = Engine(room.scene, cfg)

    from realisticaudioraytracing2d_tpu.models.materials import (
        MATERIAL_INTERIOR)
    from realisticaudioraytracing2d_tpu.models.scene import (SceneBuilder,
                                                             Transform2D)

    pad = room.scene.a.shape[0] + 4

    def scene_at(i):
        # SmollRoom walls + one obstacle sliding right 0.4 units/chunk
        b = SceneBuilder()
        b.add_box(MATERIAL_INTERIOR,
                  Transform2D((-10.0 + 0.4 * i, 2.0), 0.3, (3.0, 1.0)))
        obst = b.build()
        return room.scene.concat(obst, pad_to=pad)

    def params_at(i):
        return eng.params(room.source,
                          room.listener + np.array([0.2 * i, 0.0],
                                                   np.float32))

    streamer = Streamer(scene_at(0), cfg, jax.random.PRNGKey(7))
    wet = np.asarray(streamer.stream_clip(dry, params_at,
                                          scene_fn=scene_at))[0]

    # Host oracle: same per-chunk IR derivation as the static oracle test,
    # but scene/params vary per chunk.
    n = cfg.audio.chunk_samples
    T = cfg.audio.ir_length
    from realisticaudioraytracing2d_tpu.ops import ir as irm
    from realisticaudioraytracing2d_tpu.ops.rng import frame_key
    from realisticaudioraytracing2d_tpu.ops.trace import trace_hits_only

    def chunk_ir(i):
        k = frame_key(frame_key(jax.random.PRNGKey(7), i), 0)
        hits = trace_hits_only(scene_at(i), params_at(i),
                               k, n_rays=cfg.sim.ray_count,
                               max_bounces=cfg.sim.max_bounces)
        st = irm.accumulate(irm.IRState.zeros(T, 1, 1), hits, sr)
        return st.normalized()[0, :, 0]

    total_chunks = int(np.ceil(dry.shape[0] / n)) + int(np.ceil(T / n))
    acc = np.zeros(total_chunks * n + T + n)
    prev = None
    for i in range(total_chunks):
        ir_i = np.asarray(chunk_ir(i))
        piece = np.asarray(dry[i * n:(i + 1) * n])
        piece = np.pad(piece, (0, n - len(piece)))
        pi = ir_i if prev is None else prev
        w = np.asarray(cv.convolve_chunk_crossfade(
            jnp.asarray(piece), jnp.asarray(pi), jnp.asarray(ir_i), 1, 1))
        acc[i * n:i * n + len(w)] += w
        prev = ir_i
    np.testing.assert_allclose(wet, acc[:len(wet)], rtol=2e-3, atol=2e-5)


def test_stream_state_shapes(setup):
    room, cfg = setup
    st = init_stream(cfg.audio.ir_length, cfg.audio.chunk_samples, 2, 1)
    assert st.prev_ir.shape == (2, cfg.audio.ir_length, 1)
    assert st.ring.data.shape[0] == 2


def test_stream_position_wraps_without_absolute_offset(setup):
    # regression: the stream position is the ring read head (wraps mod
    # size); many chunks must keep push/drain aligned with no drift.
    room, cfg = setup
    eng = Engine(room.scene, cfg)
    p = eng.params(room.source, room.listener)
    s = Streamer(room.scene, cfg, jax.random.PRNGKey(0))
    n = cfg.audio.chunk_samples
    ring_size = s.state.ring.size
    chunks_to_wrap = ring_size // n + 3
    dry = jnp.ones((n,), jnp.float32) * 0.3
    outs = [np.asarray(s.process(dry, p)) for _ in range(chunks_to_wrap)]
    assert int(s.state.chunk_index) == chunks_to_wrap
    # steady state: every chunk past the first IR-length has energy and
    # nothing explodes after the ring wraps
    assert all(np.all(np.isfinite(o)) for o in outs)
    assert np.abs(outs[-1]).sum() > 0


def test_stereo_stream_matches_mono_streams(setup):
    """Stereo streaming == two mono streams at the ear positions when the
    per-chunk RNG keys coincide (same scene key)."""
    room, cfg = setup
    sr = cfg.audio.sample_rate
    dry = jnp.asarray(noise_burst(0.12, sr, seed=7))
    ears = np.stack([room.listener - [0.3, 0.0],
                     room.listener + [0.3, 0.0]]).astype(np.float32)
    eng2 = Engine(room.scene, cfg, n_listeners=2)
    p2 = eng2.params(room.source, ears)
    s2 = Streamer(room.scene, cfg, jax.random.PRNGKey(4), n_listeners=2)
    wet2 = np.asarray(s2.stream_clip(dry, lambda i: p2))

    eng1 = Engine(room.scene, cfg)
    for ear in range(2):
        p1 = eng1.params(room.source, ears[ear])
        s1 = Streamer(room.scene, cfg, jax.random.PRNGKey(4))
        wet1 = np.asarray(s1.stream_clip(dry, lambda i: p1))[0]
        # same keys -> same traced rays; the ear's channel must match the
        # standalone mono stream exactly up to float reduction order
        np.testing.assert_allclose(wet2[ear], wet1, rtol=1e-4, atol=1e-7)


def test_dry_chunk_loop_wraps_at_seam():
    # Seam chunk = tail-of-clip + head-of-clip, the functional equivalent
    # of the reference's sampleOffset reset (RayTraceManager.cs:74-77).
    from realisticaudioraytracing2d_tpu.streaming import dry_chunk
    dry = jnp.arange(10, dtype=jnp.float32)
    n = 4
    np.testing.assert_array_equal(np.asarray(dry_chunk(dry, 0, n, True)),
                                  [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(dry_chunk(dry, 2, n, True)),
                                  [8, 9, 0, 1])  # the seam
    np.testing.assert_array_equal(np.asarray(dry_chunk(dry, 5, n, True)),
                                  [0, 1, 2, 3])  # second wrap (20 % 10)
    # no loop: silence after the clip end
    np.testing.assert_array_equal(np.asarray(dry_chunk(dry, 2, n, False)),
                                  [8, 9, 0, 0])
    np.testing.assert_array_equal(np.asarray(dry_chunk(dry, 5, n, False)),
                                  [0, 0, 0, 0])


def test_stream_clip_loop_continuous_across_seam():
    # A looped clip must keep producing wet signal past the clip end; the
    # unlooped stream decays to reverb tail only.
    import dataclasses
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=512)
    # IR must cover SmollRoom's ~63 ms first arrival (repo physics quirk)
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, reverb_duration=0.1,
                                       chunk_duration=0.05, loop=True))
    n = cfg.audio.chunk_samples
    # 3-chunk dry clip of constant noise
    dry = jnp.asarray(np.random.default_rng(3).normal(
        size=3 * n).astype(np.float32) * 0.5)
    params = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)

    def run(loop, total):
        s = Streamer(room.scene, cfg, jax.random.PRNGKey(0))
        return np.asarray(s.stream_clip(dry, lambda i: params, loop=loop,
                                        total_chunks=total))[0]

    looped = run(True, 8)
    once = run(False, 8)
    assert looped.shape[-1] == 8 * n
    e = (looped.reshape(8, n) ** 2).sum(axis=1)
    # steady state: every post-warmup chunk keeps full energy across the
    # 3-chunk seam (chunks 3, 6 restart the clip)
    assert e[3:].min() > 0.3 * e[1:3].max()
    # the single-shot stream is silent once clip + tail have flushed
    e1 = (once.reshape(8, n) ** 2).sum(axis=1)
    assert e1[6:].max() < 1e-10
    assert e[6:].min() > 1e-4


def test_stream_clip_loop_requires_total_chunks():
    room = art.rooms.smoll_room()
    cfg = art.smoll_room_config(ray_count=512)
    s = Streamer(room.scene, cfg, jax.random.PRNGKey(0))
    params = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    with pytest.raises(ValueError, match="total_chunks"):
        s.stream_clip(jnp.zeros(100), lambda i: params, loop=True)


# ---- binaural streaming ----------------------------------------------------


def test_binaural_stream_degenerate_head_equals_mono(setup):
    # head_radius=0 + shadow=0: no ITD, unit ear gains -> each ear IR
    # collapses to W (== the plain mono IR; the 3-mic trace shares the
    # mono trace's ray physics), so the binaural stream must equal the
    # mono stream on both channels
    room, cfg = setup
    sr = cfg.audio.sample_rate
    dry = jnp.asarray(noise_burst(0.15, sr, seed=2))
    eng = Engine(room.scene, cfg)
    p = eng.params(room.source, room.listener)

    mono = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                      .stream_clip(dry, lambda i: p))[0]
    both = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0),
                               binaural=True, head_radius=0.0, shadow=0.0)
                      .stream_clip(dry, lambda i: p))
    assert both.shape[0] == 2
    scale = np.abs(mono).max()
    np.testing.assert_allclose(both[0], mono, atol=2e-6 * scale)
    np.testing.assert_allclose(both[1], mono, atol=2e-6 * scale)


def test_binaural_stream_head_turn_pans(setup):
    # source straight ahead at facing=0 -> symmetric ears; head turned
    # +90 deg (source now on the RIGHT) -> right ear louder. The facing
    # is traced: both chunks reuse one compile.
    room, cfg = setup
    sr = cfg.audio.sample_rate
    dry = jnp.asarray(noise_burst(0.3, sr, seed=4))
    eng = Engine(room.scene, cfg)
    p = eng.params(room.source, room.listener)

    def run(facing):
        s = Streamer(room.scene, cfg, jax.random.PRNGKey(1), binaural=True,
                     shadow=0.9)
        return np.asarray(s.stream_clip(dry, lambda i: p,
                                        facing_fn=lambda i: facing))

    # SmollRoom: source is at bearing ~atan2 of (source-listener) from
    # the listener; compute it so the test is geometry-robust
    src = np.asarray(room.source, np.float32)
    lis = np.asarray(room.listener, np.float32).reshape(-1)[:2]
    bearing = float(np.arctan2(src[1] - lis[1], src[0] - lis[0]))

    toward = run(bearing)            # facing the source: near-symmetric
    left_of = run(bearing - np.pi / 2)   # source on the LEFT ear side
    e = lambda x: float((x ** 2).sum())  # noqa: E731
    # room reverb is not symmetric about the source axis, so "toward" is
    # only approximately balanced — but turning the head 90 deg must
    # produce a much stronger, correctly-signed imbalance
    ratio_toward = e(toward[0]) / e(toward[1])
    ratio_left = e(left_of[0]) / e(left_of[1])
    assert ratio_left > 1.5, ratio_left
    assert ratio_left > 1.5 * ratio_toward, (ratio_left, ratio_toward)


def test_binaural_stream_chunk_validates_shapes(setup):
    room, cfg = setup
    sr = cfg.audio.sample_rate
    p = TraceParams.make(room.source, room.listener)
    state = init_stream(cfg.audio.ir_length, cfg.audio.chunk_samples,
                        n_listeners=1)   # needs 2 ear channels
    with pytest.raises(ValueError, match="binaural"):
        stream_chunk(room.scene, p, state,
                     jnp.zeros(cfg.audio.chunk_samples),
                     jax.random.PRNGKey(0), n_rays=64, max_bounces=3,
                     sample_rate=sr,
                     binaural_facing=jnp.asarray(0.0))


# ---- Doppler dry feed ------------------------------------------------------


def warp_at(dry, pos, rate, n, loop=False):
    # host float64 pos -> the exact int/frac split DopplerFeed hands over
    import math
    from realisticaudioraytracing2d_tpu.streaming import warp_chunk
    base = math.floor(pos)
    return warp_chunk(dry, jnp.asarray(base, jnp.int32),
                      jnp.asarray(pos - base, jnp.float32),
                      jnp.asarray(rate, jnp.float32), n, loop=loop)


def test_warp_chunk_rate_one_is_identity():
    dry = jnp.asarray(np.random.default_rng(0).normal(size=256)
                      .astype(np.float32))
    a = warp_at(dry, 0.0, 1.0, 128)
    b = warp_at(dry, 128.0, 1.0, 128)
    np.testing.assert_array_equal(np.concatenate([a, b]), np.asarray(dry))
    # past the clip end: silence (tail flush)
    c = warp_at(dry, 256.0, 1.0, 64)
    np.testing.assert_array_equal(np.asarray(c), np.zeros(64))


def test_warp_chunk_chunking_is_continuous():
    dry = jnp.asarray(np.sin(np.arange(512) * 0.13).astype(np.float32))
    one = warp_at(dry, 3.2, 0.87, 256)
    a = warp_at(dry, 3.2, 0.87, 128)
    b = warp_at(dry, 3.2 + 0.87 * 128, 0.87, 128)
    # f32: the second chunk's fraction rounds differently than the
    # one-shot frac + rate*(n+j) indexing
    np.testing.assert_allclose(np.concatenate([a, b]), np.asarray(one),
                               atol=5e-6)


def test_warp_chunk_shifts_pitch():
    sr, f0, rate = 8000, 400.0, 0.9
    t = np.arange(4 * sr) / sr
    dry = jnp.asarray(np.sin(2 * np.pi * f0 * t).astype(np.float32))
    out = warp_at(dry, 0.0, rate, 2 * sr)
    spec = np.abs(np.fft.rfft(np.asarray(out)))
    peak_hz = np.argmax(spec) / 2.0            # 2 s window: 0.5 Hz bins
    assert abs(peak_hz - f0 * rate) < 1.0, peak_hz


def test_warp_chunk_long_stream_position_stays_exact():
    # the ADVICE round-3 case: an absolute f32 position past 2^23 samples
    # quantizes to multi-sample steps; the int-base + f32-frac split must
    # read the right samples arbitrarily deep into a stream
    base_pos = float(2 ** 24 + 3) + 0.25       # unrepresentable in f32
    n = 64
    rng = np.random.default_rng(1)
    seg = rng.normal(size=n + 2).astype(np.float32)
    dry_np = np.zeros(2 ** 24 + 128, np.float32)
    dry_np[2 ** 24 + 3 : 2 ** 24 + 3 + n + 2] = seg
    out = np.asarray(warp_at(jnp.asarray(dry_np), base_pos, 1.0, n))
    want = seg[:-2] * 0.75 + seg[1:-1] * 0.25
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_doppler_stream_static_poses_matches_plain(setup):
    # zero radial velocity -> rate exactly 1 -> the Doppler feed reads
    # the same samples; streams must agree bit-for-bit
    room, cfg = setup
    sr = cfg.audio.sample_rate
    dry = jnp.asarray(noise_burst(0.15, sr, seed=5))
    eng = Engine(room.scene, cfg)
    p = eng.params(room.source, room.listener)
    plain = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                       .stream_clip(dry, lambda i: p))
    dopp = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                      .stream_clip(dry, lambda i: p, doppler=True))
    np.testing.assert_array_equal(plain, dopp)


def test_doppler_stream_receding_source_lowers_pitch(setup):
    # a source receding at 0.1c must shift a 400 Hz tone to ~360 Hz in
    # the streamed output; the plain stream keeps it at ~400 Hz
    room, cfg = setup
    sr = cfg.audio.sample_rate
    f0, v = 400.0, 34.3
    t = np.arange(int(0.6 * sr)) / sr
    dry = jnp.asarray(np.sin(2 * np.pi * f0 * t).astype(np.float32) * 0.5)
    eng = Engine(room.scene, cfg)
    chunk_dt = cfg.audio.chunk_duration

    def poses(i):
        # source receding straight down the source->listener axis
        src = np.asarray(room.source, np.float32)
        lis = np.asarray(room.listener, np.float32).reshape(-1)[:2]
        u = (src - lis) / np.linalg.norm(src - lis)
        return eng.params(src + u * (v * chunk_dt * i), lis)

    def peak_hz(wet):
        seg = wet[0, int(0.1 * sr):int(0.5 * sr)]
        spec = np.abs(np.fft.rfft(seg * np.hanning(seg.size)))
        return np.argmax(spec) * sr / seg.size

    dopp = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                      .stream_clip(dry, poses, doppler=True))
    plain = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                       .stream_clip(dry, poses))
    assert abs(peak_hz(plain) - f0) < 12.0, peak_hz(plain)
    assert abs(peak_hz(dopp) - f0 * (1 - v / 343.0)) < 12.0, peak_hz(dopp)


def test_doppler_stream_pose_table_of_exact_length(setup):
    # params_fn's documented domain is [0, n_steps); the Doppler path
    # used to call params_fn(n_steps) on the final chunk (IndexError on
    # a pose table sized exactly n_steps). The last chunk now reuses the
    # previous chunk's rate.
    room, cfg = setup
    sr = cfg.audio.sample_rate
    dry = jnp.asarray(noise_burst(0.15, sr, seed=5))
    eng = Engine(room.scene, cfg)
    n = cfg.audio.chunk_samples
    n_chunks = (dry.shape[-1] + n - 1) // n
    tail = (cfg.audio.ir_length + n - 1) // n
    n_steps = n_chunks + tail
    table = [eng.params(np.asarray(room.source, np.float32)
                        + np.float32([0.01 * i, 0.0]), room.listener)
             for i in range(n_steps)]
    wet = np.asarray(Streamer(room.scene, cfg, jax.random.PRNGKey(0))
                     .stream_clip(dry, lambda i: table[i], doppler=True))
    assert wet.shape[-1] == n_steps * n
    assert np.isfinite(wet).all()
