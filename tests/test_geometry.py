"""Geometry primitive tests: NumPy-oracle parity + properties.

Oracle implementations independently re-derive the reference math
(``Assets/Script/Common.hlsl:14-43``) in float64 NumPy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from realisticaudioraytracing2d_tpu.ops import geometry as g


# --- float64 oracles -------------------------------------------------------

def oracle_intersect(o, d, a, b, eps=1e-4, inf=1e8):
    v1 = o - a
    v2 = b - a
    v3 = np.array([-d[1], d[0]])
    dotp = v2 @ v3
    if abs(dotp) < eps:
        return inf
    t1 = (v2[0] * v1[1] - v2[1] * v1[0]) / dotp
    t2 = v1 @ v3 / dotp
    return t1 if (t1 >= eps and 0 <= t2 <= 1) else inf


def oracle_circle(o, d, c, r, eps=1e-4, inf=1e8):
    L = c - o
    tca = L @ d
    if tca < 0:
        return inf
    d2 = L @ L - tca * tca
    if d2 > r * r:
        return inf
    thc = np.sqrt(r * r - d2)
    t0, t1 = tca - thc, tca + thc
    if t0 > eps:
        return t0
    if t1 > eps:
        return t1
    return inf


# --- ray-segment -----------------------------------------------------------

def test_segment_basic_hit():
    t = g.ray_segment_intersect(jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
                                jnp.array([2.0, -1.0]), jnp.array([2.0, 1.0]))
    assert np.isclose(float(t), 2.0, atol=1e-5)


def test_segment_behind_ray_misses():
    t = g.ray_segment_intersect(jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
                                jnp.array([-2.0, -1.0]),
                                jnp.array([-2.0, 1.0]))
    assert float(t) == g.INF


def test_segment_parallel_misses():
    t = g.ray_segment_intersect(jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
                                jnp.array([1.0, 1.0]), jnp.array([5.0, 1.0]))
    assert float(t) == g.INF


def test_segment_degenerate_is_inert():
    # Padding walls are zero-length segments: must always return INF.
    t = g.ray_segment_intersect(jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
                                jnp.zeros(2), jnp.zeros(2))
    assert float(t) == g.INF


def test_segment_oracle_fuzz(rng):
    n = 500
    o = rng.uniform(-10, 10, (n, 2))
    ang = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.cos(ang), np.sin(ang)], -1)
    a = rng.uniform(-10, 10, (n, 2))
    b = rng.uniform(-10, 10, (n, 2))
    got = np.asarray(g.ray_segment_intersect(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    for i in range(n):
        want = oracle_intersect(o[i], d[i], a[i], b[i])
        if want >= g.INF:
            assert got[i] >= g.INF * 0.99, i
        else:
            # skip razor-edge cases where f32 vs f64 flips validity
            t2o = abs(want - got[i])
            assert t2o < 1e-2 * max(1.0, abs(want)) or got[i] >= g.INF, i


def test_pairwise_matches_single(rng):
    o = jnp.asarray(rng.uniform(-5, 5, (64, 2)), jnp.float32)
    ang = rng.uniform(0, 2 * np.pi, 64)
    d = jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1), jnp.float32)
    a = jnp.asarray(rng.uniform(-5, 5, (33, 2)), jnp.float32)
    b = jnp.asarray(rng.uniform(-5, 5, (33, 2)), jnp.float32)
    pair = g.pairwise_ray_segment_t(o, d, a, b)
    brute = g.ray_segment_intersect(o[:, None, :], d[:, None, :],
                                    a[None, :, :], b[None, :, :])
    np.testing.assert_allclose(np.asarray(pair), np.asarray(brute),
                               rtol=1e-4, atol=1e-4)


# --- ray-circle ------------------------------------------------------------

def test_circle_head_on():
    t = g.ray_circle_intersect(jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
                               jnp.array([5.0, 0.0]), jnp.asarray(1.0))
    assert np.isclose(float(t), 4.0, atol=1e-5)


def test_circle_from_inside_returns_exit():
    t = g.ray_circle_intersect(jnp.array([5.0, 0.0]), jnp.array([1.0, 0.0]),
                               jnp.array([5.0, 0.0]), jnp.asarray(1.0))
    assert np.isclose(float(t), 1.0, atol=1e-5)


def test_circle_behind_misses():
    t = g.ray_circle_intersect(jnp.array([0.0, 0.0]), jnp.array([-1.0, 0.0]),
                               jnp.array([5.0, 0.0]), jnp.asarray(1.0))
    assert float(t) == g.INF


def test_circle_oracle_fuzz(rng):
    n = 500
    o = rng.uniform(-10, 10, (n, 2))
    ang = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.cos(ang), np.sin(ang)], -1)
    c = rng.uniform(-10, 10, (n, 2))
    r = rng.uniform(0.1, 3.0, n)
    got = np.asarray(g.ray_circle_intersect(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(c, jnp.float32), jnp.asarray(r, jnp.float32)))
    for i in range(n):
        want = oracle_circle(o[i], d[i], c[i], r[i])
        if want >= g.INF:
            assert got[i] >= g.INF * 0.99, i
        else:
            assert abs(want - got[i]) < 1e-2, i


# --- reflect / refract -----------------------------------------------------

def test_reflect():
    d = jnp.array([1.0, -1.0]) / np.sqrt(2)
    n = jnp.array([0.0, 1.0])
    r = g.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r),
                               np.array([1.0, 1.0]) / np.sqrt(2), atol=1e-6)


def test_refract_straight_through_eta1():
    d = jnp.array([0.0, -1.0])
    n = jnp.array([0.0, 1.0])
    t, ok = g.refract(d, n, jnp.asarray(1.0))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(t), np.asarray(d), atol=1e-6)


def test_refract_snell_angle():
    # 45 deg incidence, eta = 0.5 -> sin(theta_t) = 0.5*sin(45)
    th_i = np.pi / 4
    d = jnp.array([np.sin(th_i), -np.cos(th_i)], dtype=jnp.float32)
    n = jnp.array([0.0, 1.0])
    eta = 0.5
    t, ok = g.refract(d, n, jnp.asarray(eta))
    assert bool(ok)
    sin_t = float(t[0])  # x-component of unit transmitted dir = sin(theta_t)
    assert np.isclose(sin_t, eta * np.sin(th_i), atol=1e-5)
    assert np.isclose(float(jnp.linalg.norm(t)), 1.0, atol=1e-5)


def test_refract_tir():
    # eta > 1 at grazing incidence -> total internal reflection
    th_i = np.pi / 3
    d = jnp.array([np.sin(th_i), -np.cos(th_i)], dtype=jnp.float32)
    n = jnp.array([0.0, 1.0])
    t, ok = g.refract(d, n, jnp.asarray(2.0))
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(t), np.zeros(2), atol=1e-6)


def test_rotate_and_perp():
    v = jnp.array([1.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(g.rotate(v, jnp.asarray(np.pi / 2))),
        np.array([0.0, 1.0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.perp(v)),
                               np.array([0.0, 1.0]), atol=1e-6)


def test_normalize_zero_safe():
    out = g.normalize(jnp.zeros(2))
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.zeros(2))


def test_nearest_hit_miss_sentinel():
    t = jnp.full((4, 3), g.INF)
    closest, idx = g.nearest_hit(t)
    assert np.all(np.asarray(idx) == -1)
    t = t.at[1, 2].set(3.0)
    closest, idx = g.nearest_hit(t)
    assert int(idx[1]) == 2 and np.isclose(float(closest[1]), 3.0)
    assert int(idx[0]) == -1
