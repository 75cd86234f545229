"""Wall-sweep bilinear forms on VPU vs MXU — the measured negative result
behind docs/PERF.md "MXU offload of the wall sweep".

The sweep's three bilinear forms (dotp, n1, n2 — the products inside
``bounce_kernel._wall_pass``, reference semantics `Raytrace2D.compute`
ray/segment test) factor exactly as ``[3Wp, 8] @ [8, T]`` matmuls over
per-ray features ``(dx, dy, ox, oy, oy*dx-ox*dy, 1)``. This script times
the two formulations head-to-head in otherwise-identical Pallas kernels
(identical compare/select/min epilogue). Measured on v5e: 1.00x — the
epilogue dominates and the contraction depth of 8 caps the MXU at 8/128
utilization. Run on a real TPU:

    PYTHONPATH=/root/repo python examples/sweep_mxu_microbench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-4
INF = 1e30
WP = 1024      # walls
T = 1024       # ray tile
ITERS = 64     # bounce-like repeats inside the kernel


def _recip(x):
    inv = pl.reciprocal(x, approx=True)
    return inv * (2.0 - x * inv)


def epilogue(dotp, n1, n2):
    """The part neither variant can move off the VPU (matches
    ``_wall_pass``'s validity logic + the nearest-hit min)."""
    safe = jnp.where(jnp.abs(dotp) < EPS, 1.0, dotp)
    t1 = n1 * _recip(safe)
    ok = ((jnp.abs(dotp) >= EPS) & (t1 >= EPS)
          & (n2 * safe >= 0.0) & (jnp.abs(n2) <= jnp.abs(safe)))
    t = jnp.where(ok, t1, INF)
    return jnp.min(t, axis=0, keepdims=True)


def vpu_kernel(geo_ref, ray_ref, out_ref):
    ax = geo_ref[:, 0:1]
    ay = geo_ref[:, 1:2]
    v2x = geo_ref[:, 2:3]
    v2y = geo_ref[:, 3:4]
    cc = geo_ref[:, 4:5]

    def body(i, acc):
        f = jnp.float32(1.0) + jnp.float32(1e-6) * i  # defeat CSE/hoisting
        ox = ray_ref[0:1, :] * f
        oy = ray_ref[1:2, :] * f
        dx = ray_ref[2:3, :]
        dy = ray_ref[3:4, :]
        dotp = v2y * dx - v2x * dy
        n1 = v2x * oy - v2y * ox - cc
        n2 = (oy * dx - ox * dy) - (ay * dx - ax * dy)
        return acc + epilogue(dotp, n1, n2)

    out_ref[...] = jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((1, T), jnp.float32))


def mxu_kernel(w3_ref, ray_ref, out_ref):
    # w3: [3*WP, 8] coefficient rows (dotp block, n1 block, n2 block)
    def body(i, acc):
        f = jnp.float32(1.0) + jnp.float32(1e-6) * i
        ox = ray_ref[0:1, :] * f
        oy = ray_ref[1:2, :] * f
        dx = ray_ref[2:3, :]
        dy = ray_ref[3:4, :]
        one = jnp.ones((1, T), jnp.float32)
        r0 = oy * dx - ox * dy
        feats = jnp.concatenate(
            [dx, dy, ox, oy, r0, one,
             jnp.zeros((2, T), jnp.float32)], axis=0)      # [8, T]
        big = jnp.dot(w3_ref[...], feats,
                      preferred_element_type=jnp.float32)  # [3WP, T]
        return acc + epilogue(big[0:WP, :], big[WP:2 * WP, :],
                              big[2 * WP:3 * WP, :])

    out_ref[...] = jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((1, T), jnp.float32))


def coeffs(geo: np.ndarray) -> np.ndarray:
    """Wall coefficient rows against the feature order
    ``[dx, dy, ox, oy, r0, 1, 0, 0]``."""
    ax, ay, v2x, v2y, cc = (geo[:, i] for i in range(5))
    z = np.zeros_like(ax)
    one = np.ones_like(ax)
    w_dotp = np.stack([v2y, -v2x, z, z, z, z, z, z], 1)
    w_n1 = np.stack([z, z, -v2y, v2x, z, -cc, z, z], 1)
    w_n2 = np.stack([-ay, ax, z, z, one, z, z, z], 1)
    return np.concatenate([w_dotp, w_n1, w_n2], 0).astype(np.float32)


def run(kernel, table, rays, name):
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, T), jnp.float32),
        in_specs=[pl.BlockSpec(table.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(rays.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    jfn = jax.jit(fn)
    out = jfn(table, rays)
    float(out.sum())                       # readback = sync barrier
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(table, rays)
    s = float(out.sum())
    dt = (time.perf_counter() - t0) / reps
    tests = WP * T * ITERS
    print(f"{name}: {dt*1e3:.3f} ms, {tests/dt/1e9:.1f} G tests/s "
          f"(checksum {s:.1f})")
    return out, dt


def main():
    rng = np.random.default_rng(0)
    geo = rng.normal(size=(WP, 8)).astype(np.float32)
    rays = rng.normal(size=(8, T)).astype(np.float32)
    o1, t_vpu = run(vpu_kernel, jnp.asarray(geo), jnp.asarray(rays), "vpu")
    o2, t_mxu = run(mxu_kernel, jnp.asarray(coeffs(geo)),
                    jnp.asarray(rays), "mxu")
    # checksums differ slightly: reordered f32 arithmetic flips
    # razor-edge validity decisions, same as the fused-vs-oracle parity
    print("max |diff| =", float(jnp.abs(o1 - o2).max()))
    print(f"mxu/vpu time ratio: {t_mxu/t_vpu:.2f}x")


if __name__ == "__main__":
    main()
