"""RNG tests: bit-exact HLSL hash parity (NumPy oracle) + uniformity."""

import jax
import numpy as np

from realisticaudioraytracing2d_tpu.ops import rng as r


def oracle_hlsl_random(state: int):
    """Pure-Python uint32 port of Common.hlsl:8-12."""
    state = (state * 747796405 + 2891336453) & 0xFFFFFFFF
    shift = ((state >> 28) + 4) & 0xFFFFFFFF
    res = (((state >> shift) ^ state) * 277803737) & 0xFFFFFFFF
    res = ((res >> 22) ^ res) & 0xFFFFFFFF
    return res / 4294967295.0, state


def test_hlsl_random_bit_parity():
    states = np.array([0, 1, 42, 719393, 2**31, 0xFFFFFFFF], dtype=np.uint64)
    vals_j, new_j = r.hlsl_random(states.astype(np.uint32))
    for i, s in enumerate(states):
        want_v, want_s = oracle_hlsl_random(int(s))
        assert int(new_j[i]) == want_s
        assert abs(float(vals_j[i]) - want_v) < 1e-6


def test_hlsl_random_sequence_parity():
    s = np.uint32(12345)
    sj = np.asarray([12345], dtype=np.uint32)
    py_state = 12345
    for _ in range(10):
        vj, sj = r.hlsl_random(sj)
        want_v, py_state = oracle_hlsl_random(py_state)
        assert abs(float(vj[0]) - want_v) < 1e-6


def test_hlsl_random_roughly_uniform():
    states = np.arange(20000, dtype=np.uint32)
    vals, _ = r.hlsl_random(states)
    vals = np.asarray(vals)
    assert 0.0 <= vals.min() and vals.max() <= 1.0
    assert abs(vals.mean() - 0.5) < 0.01
    hist, _ = np.histogram(vals, bins=10, range=(0, 1))
    assert hist.min() > 1500  # no empty decile


def test_ray_init_state_matches_reference_seed():
    # Raytrace2D.compute:51: rng = id.x + rngStateOffset * 719393
    st = r.ray_init_state(4, np.uint32(7))
    want = (np.arange(4) + 7 * 719393) & 0xFFFFFFFF
    np.testing.assert_array_equal(np.asarray(st), want.astype(np.uint32))


def test_frame_key_deterministic():
    k = jax.random.PRNGKey(3)
    a = r.frame_key(k, 5)
    b = r.frame_key(k, 5)
    c = r.frame_key(k, 6)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_bounce_uniforms_shapes_and_range():
    k = jax.random.PRNGKey(0)
    emit, u = r.bounce_uniforms(k, 5, 128)
    assert emit.shape == (128,)
    assert u.shape == (5, 128, 3)
    assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
