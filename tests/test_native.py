"""Native host-runtime tests: C++ lib vs NumPy fallback vs SceneBuilder."""

import numpy as np
import pytest

from realisticaudioraytracing2d_tpu import native
from realisticaudioraytracing2d_tpu.models.materials import MATERIAL_BORDER
from realisticaudioraytracing2d_tpu.models.scene import (SceneBuilder,
                                                         Transform2D)


def test_native_lib_compiles():
    # In this image g++ exists; the lib should compile. If it genuinely
    # can't, the numpy fallbacks keep everything working (other tests).
    assert native.available() in (True, False)


def _boxes_case():
    return np.array([
        [0.0, 10.0, 0.0, 100.0, 1.0, 1.0, 1.0, 0.0, 0.0],
        [2.0, 3.0, np.pi / 2, 4.0, 2.0, 1.0, 1.0, 0.0, 0.0],
        [-1.0, 0.5, 0.3, -2.0, 1.5, 2.0, 0.5, 0.1, -0.2],
    ], np.float32)


def test_flatten_boxes_matches_scene_builder():
    boxes = _boxes_case()
    segs = native.flatten_boxes(boxes)
    assert segs.shape == (12, 6)
    b = SceneBuilder()
    for x, y, ang, sx, sy, w, h, ox, oy in boxes:
        b.add_box(MATERIAL_BORDER,
                  Transform2D((float(x), float(y)), float(ang),
                              (float(sx), float(sy))),
                  size=(float(w), float(h)), offset=(float(ox), float(oy)))
    s = b.build(pad_to=12)
    np.testing.assert_allclose(segs[:, 0:2], np.asarray(s.a), atol=1e-4)
    np.testing.assert_allclose(segs[:, 2:4], np.asarray(s.b), atol=1e-4)
    np.testing.assert_allclose(segs[:, 4:6], np.asarray(s.normal), atol=1e-4)


def test_flatten_boxes_native_vs_fallback():
    if not native.available():
        pytest.skip("no native lib")
    boxes = _boxes_case()
    got = native.flatten_boxes(boxes)
    # force fallback path
    lib, native._lib = native._lib, None
    tried = native._tried
    native._tried = True
    try:
        want = native.flatten_boxes(boxes)
    finally:
        native._lib, native._tried = lib, tried
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flatten_loop():
    tri = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    segs = native.flatten_loop(tri, (1.0, 2.0, 0.0, 1.0, 1.0))
    assert segs.shape == (3, 6)
    np.testing.assert_allclose(segs[0, :2], [1.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(segs[0, 2:4], [2.0, 2.0], atol=1e-6)
    # edge 0 runs +x; normal (dy, -dx) = (0, -1)
    np.testing.assert_allclose(segs[0, 4:6], [0.0, -1.0], atol=1e-6)


def test_ring_buffer_native_matches_semantics():
    rb = native.NativeRingBuffer(8, channels=1)
    rb.push(np.ones(4, np.float32), 0)
    rb.push(np.ones(4, np.float32), 2)
    out = rb.drain(6)[0]
    np.testing.assert_allclose(out, [1, 1, 2, 2, 1, 1])
    out2 = rb.drain(2)[0]
    np.testing.assert_allclose(out2, [0, 0])
    assert rb.read_head == 0  # wrapped exactly once around size 8


def test_ring_buffer_wraparound_and_channels():
    rb = native.NativeRingBuffer(8, channels=2)
    x = np.stack([np.ones(6, np.float32), 2 * np.ones(6, np.float32)])
    rb.push(x, 5)  # wraps
    out = rb.drain(8)
    # layout: positions 5,6,7,0,1,2 hold data
    np.testing.assert_allclose(out[0], [1, 1, 1, 0, 0, 1, 1, 1])
    np.testing.assert_allclose(out[1], [2, 2, 2, 0, 0, 2, 2, 2])


def test_ring_buffer_threaded_integrity():
    # Producer pushes overlapping chunks; consumer drains concurrently.
    # Total energy in == energy out (the lock keeps add/zero atomic).
    import threading
    rb = native.NativeRingBuffer(1024, channels=1)
    n_chunks, chunk = 64, 128
    total_in = n_chunks * chunk * 1.0
    done = threading.Event()
    drained = []

    def producer():
        for i in range(n_chunks):
            rb.push(np.ones(chunk, np.float32), i * chunk // 2)
        done.set()

    def consumer():
        while not done.is_set() or rb.read_head != -1:
            drained.append(rb.drain(64).sum())
            if done.is_set() and len(drained) > n_chunks * 4:
                break

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t1.start(); t2.start()
    t1.join(); t2.join(timeout=10)
    # drain whatever remains
    for _ in range(40):
        drained.append(rb.drain(64).sum())
    assert sum(drained) == pytest.approx(total_in)


def test_morton_clusters_beyond_2_20_segments_valid_permutation():
    # Regression: the sort key packs the wall index into the low bits of a
    # uint64; with only 20 index bits, >1,048,576 segments silently alias
    # into a non-permutation. The index field is now 31 bits wide.
    n = (1 << 20) + 3
    rng = np.random.default_rng(0)
    a = rng.uniform(-50, 50, size=(n, 2)).astype(np.float32)
    b = a + rng.uniform(0.01, 1.0, size=(n, 2)).astype(np.float32)
    segs = np.concatenate([a, b, np.zeros((n, 2), np.float32)], axis=1)
    order, aabb = native.morton_clusters(segs, cluster_size=256)
    assert order.shape == (n,)
    seen = np.zeros(n, bool)
    seen[order] = True
    assert seen.all()          # a true permutation: every index exactly once
    assert aabb.shape == (-(-n // 256), 4)
    assert np.isfinite(aabb).all()


# ---- mp3 codec binding (mp3dec.cpp: system libmpg123/libmp3lame) ----

needs_mp3 = pytest.mark.skipif(
    not all(native.mp3_probe()),
    reason="system mp3 codecs (libmpg123/libmp3lame) not available")


@needs_mp3
def test_mp3_round_trip_mono_sine(tmp_path):
    # encode a 440 Hz sine, decode it back, recover the tone's amplitude
    # via quadrature correlation — pins the dlopen'd ABI constants
    # (ENC_FLOAT_32 = 0x200, pre-open format lock) against the real libs
    rate = 44100
    t = np.arange(rate) / rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "sine.mp3")
    native.encode_mp3(p, x, rate, kbps=128)
    y, r = native.decode_mp3(p)
    assert r == rate
    assert y.ndim == 1 and len(y) >= rate          # lame pads the tail
    assert np.isfinite(y).all() and np.abs(y).max() <= 1.5
    y = y[np.argmax(np.abs(y) > 1e-4):].astype(np.float64)
    n = rate // 2
    tt = np.arange(n) / rate
    amp = np.hypot(np.dot(y[:n], np.sin(2 * np.pi * 440 * tt)),
                   np.dot(y[:n], np.cos(2 * np.pi * 440 * tt))) / (n / 2)
    assert abs(amp - 0.5) < 0.08                   # mp3 is lossy, not deaf


@needs_mp3
def test_mp3_round_trip_stereo_distinct_channels(tmp_path):
    rate = 44100
    t = np.arange(rate) / rate
    x = np.stack([0.4 * np.sin(2 * np.pi * 330 * t),
                  0.3 * np.sin(2 * np.pi * 660 * t)], -1).astype(np.float32)
    p = str(tmp_path / "st.mp3")
    native.encode_mp3(p, x, rate, kbps=160)
    y, r = native.decode_mp3(p)
    assert r == rate and y.ndim == 2 and y.shape[1] == 2
    n = rate // 2
    tt = np.arange(n) / rate
    for c, (f, want) in enumerate(((330, 0.4), (660, 0.3))):
        yc = y[:, c].astype(np.float64)
        yc = yc[np.argmax(np.abs(yc) > 1e-4):]
        amp = np.hypot(np.dot(yc[:n], np.sin(2 * np.pi * f * tt)),
                       np.dot(yc[:n], np.cos(2 * np.pi * f * tt))) / (n / 2)
        assert abs(amp - want) < 0.08


@needs_mp3
def test_mp3_decode_errors(tmp_path):
    with pytest.raises(RuntimeError):
        native.decode_mp3(str(tmp_path / "missing.mp3"))
    bad = str(tmp_path / "bad.mp3")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 4096)                    # no MPEG frame anywhere
    with pytest.raises(RuntimeError):
        native.decode_mp3(bad)


@needs_mp3
def test_read_audio_dispatches_on_extension(tmp_path):
    from realisticaudioraytracing2d_tpu.utils.audio_io import (read_audio,
                                                               write_audio)
    rate = 22050
    x = (0.25 * np.sin(2 * np.pi * 220 * np.arange(rate) / rate)
         ).astype(np.float32)
    for name in ("clip.wav", "clip.mp3"):
        p = str(tmp_path / name)
        write_audio(p, x, rate)
        y, r = read_audio(p)
        assert r == rate
        assert np.isfinite(y).all()
        # same signal level within codec tolerance (the mp3 path adds
        # ~1k samples of encoder/decoder delay, so compare the
        # alignment-invariant RMS: 0.25 / sqrt(2) ~= 0.177)
        mid = np.ravel(y)[len(y) // 4:3 * len(y) // 4].astype(np.float64)
        assert abs(np.sqrt((mid ** 2).mean()) - 0.25 / np.sqrt(2)) < 0.02


@needs_mp3
def test_mp3_decodes_reference_shipped_clips():
    # the reference's own dry clips (Assets/Script/*.mp3) — the assets a
    # migrating user brings along — must decode to sane PCM
    import os
    ref = "/root/reference/Assets/Script"
    clips = ["bruh.mp3", "my-leg_2.mp3"]
    if not os.path.isdir(ref):
        pytest.skip("reference assets not present")
    for c in clips:
        y, r = native.decode_mp3(os.path.join(ref, c))
        assert r in (22050, 24000, 32000, 44100, 48000)
        assert len(y) / r > 0.2                    # non-trivial duration
        assert np.isfinite(y).all()
        rms = float(np.sqrt((y.astype(np.float64) ** 2).mean()))
        assert 1e-4 < rms < 1.0


# ---- OS audio sink (ALSA via dlopen) ----------------------------------------


def test_sink_probe_reports_availability_with_reason():
    ok, reason = native.sink_probe()
    assert isinstance(ok, bool)
    assert isinstance(reason, str) and reason
    if not ok:
        # this box: no ALSA runtime -> the reason must say what's missing
        assert "asound" in reason or "native runtime" in reason


def test_audio_sink_degrades_cleanly_without_device():
    ok, reason = native.sink_probe()
    if ok:
        pytest.skip("ALSA present here; degradation path not reachable")
    with pytest.raises(RuntimeError, match="audio sink unavailable"):
        native.AudioSink(48000, 1)
