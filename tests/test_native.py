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
