"""Micro-benchmark backing the _tap_chunk lane decomposition
(streaming.py::_tap_chunk_lanes): times the gather formulation against
lane-decomposition variants (unrolled / fori / one-hot-MXU segment) at
the composed binaural shapes and checks bit-identity. Run on the
backend under study (TPU: plain `python scripts/_prof_tap.py`; the
measured numbers are quoted in streaming.py::_tap_glide and
docs/PERF.md).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

wd = 10562
n = 4800
R = 144           # composed rows: 2 ears x 4A x 3 bins x K=1
M = 100           # dtau bound
J = 2 * M + 8     # lanes
LS = n + J
rng = np.random.default_rng(0)
W = jnp.asarray(rng.normal(size=wd).astype(np.float32))
Wpad = jnp.concatenate([jnp.zeros(LS + 2), W, jnp.zeros(LS + 2)])
tau0 = jnp.asarray(rng.uniform(100, 5000, R).astype(np.float32))
dtau = jnp.asarray(rng.uniform(-60, 60, R).astype(np.float32))
tau1 = tau0 + dtau
s = jnp.arange(n, dtype=jnp.float32)


def p_of(tau0, tau1):
    r = s / n
    tau = tau0[:, None] + (tau1 - tau0)[:, None] * r[None, :]
    return (wd - n) + s[None, :] - tau


def base_gather(tau0, tau1):
    p = p_of(tau0, tau1)
    lo = jnp.floor(p)
    frac = p - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, wd - 1)
    hi_i = jnp.clip(lo_i + 1, 0, wd - 1)
    y = W[lo_i] * (1 - frac) + W[hi_i] * frac
    return jnp.where((p >= 0) & (p <= wd - 1), y, 0.0)


def strip_of(tau0):
    p0 = (wd - n) - tau0
    b = jnp.floor(p0).astype(jnp.int32) - M - 4
    st = b + LS + 2
    strip = jax.vmap(lambda a: jax.lax.dynamic_slice(Wpad, (a,), (LS,)))(st)
    return strip, b


def lanes_unrolled(tau0, tau1):
    p = p_of(tau0, tau1)
    lo = jnp.floor(p)
    frac = p - lo
    strip, b = strip_of(tau0)
    jrel = lo.astype(jnp.int32) - b[:, None] - jnp.arange(n, dtype=jnp.int32)[None, :]
    y = jnp.zeros((R, n), jnp.float32)
    for j in range(J):
        sl = jax.lax.slice(strip, (0, j), (R, j + n))
        wgt = jnp.where(jrel == j, 1.0 - frac, 0.0) + jnp.where(jrel == j - 1, frac, 0.0)
        y = y + wgt * sl
    return jnp.where((p >= 0) & (p <= wd - 1), y, 0.0)


def lanes_fori(tau0, tau1):
    p = p_of(tau0, tau1)
    lo = jnp.floor(p)
    frac = p - lo
    strip, b = strip_of(tau0)
    jrel = lo.astype(jnp.int32) - b[:, None] - jnp.arange(n, dtype=jnp.int32)[None, :]

    def body(j, y):
        sl = jax.lax.dynamic_slice(strip, (0, j), (R, n))
        wgt = jnp.where(jrel == j, 1.0 - frac, 0.0) + jnp.where(jrel == j - 1, frac, 0.0)
        return y + wgt * sl

    y = jax.lax.fori_loop(0, J, body, jnp.zeros((R, n), jnp.float32))
    return jnp.where((p >= 0) & (p <= wd - 1), y, 0.0)


def onehot_seg(tau0, tau1):
    # segment-level one-hot matmul: m=256 segments, SL=m+J2
    m = 256
    Tseg = n // m
    J2 = 2 * ((M * m) // n + 3) + 6
    SL = m + J2
    p = p_of(tau0, tau1)
    lo = jnp.floor(p)
    frac = p - lo
    pseg = p[:, ::m]                                    # [R, Tseg]
    b = jnp.floor(pseg).astype(jnp.int32) - J2 // 2 - 2
    wdp = wd + 2 * (LS + 2)
    oh = (b[..., None] + (LS + 2) == jnp.arange(wdp)[None, None, :]
          ).astype(jnp.float32)                         # [R, Tseg, wdp]
    H = jnp.stack([Wpad[u:u + wdp] for u in range(SL)], axis=1)  # [wdp, SL]
    seg = jax.lax.dot_general(oh.reshape(R * Tseg, wdp), H,
                              (((1,), (0,)), ((), ())),
                              precision="highest").reshape(R, Tseg, SL)
    jrel = (lo.astype(jnp.int32).reshape(R, Tseg, m) - b[..., None]
            - jnp.arange(m, dtype=jnp.int32)[None, None, :])
    fr = frac.reshape(R, Tseg, m)
    y = jnp.zeros((R, Tseg, m), jnp.float32)
    for j in range(J2):
        sl = jax.lax.slice(seg, (0, 0, j), (R, Tseg, j + m))
        wgt = (jnp.where(jrel == j, 1.0 - fr, 0.0)
               + jnp.where(jrel == j - 1, fr, 0.0))
        y = y + wgt * sl
    y = y.reshape(R, n)
    return jnp.where((p >= 0) & (p <= wd - 1), y, 0.0)


def timeit(name, fn):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(tau0, tau1)
    float(out.sum())
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(30):
        out = f(tau0, tau1)
    float(out.sum())
    dt = (time.perf_counter() - t0) / 30 * 1e3
    print(f"{name:22s} {dt:7.2f} ms   (compile {tc:.1f} s)")
    return np.asarray(out)


ref = timeit("base gather", base_gather)
for name, fn in [("lanes unrolled", lanes_unrolled),
                 ("lanes fori", lanes_fori),
                 ("onehot matmul seg", onehot_seg)]:
    got = timeit(name, fn)
    err = np.max(np.abs(got - ref))
    bit = np.array_equal(got, ref)
    print(f"   max|err| {err:.3e}  bit-identical {bit}")
