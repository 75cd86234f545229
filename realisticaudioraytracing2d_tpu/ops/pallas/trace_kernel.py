"""Pallas TPU kernels for the ray-wall intersection inner loop.

The trace's hot-times-hot computation (rays x walls x bounces, reference
``Raytrace2D.compute:69-72`` and the NEE ``checkVis`` occlusion loop
``:40-47``) as explicit VMEM-tiled kernels:

* the wall table is packed once per scene into an ``[8, Wp]`` float32
  block (rows: ax, ay, v2x, v2y, cross_const; lanes = walls, padded to a
  multiple of 128) and stays VMEM-resident across the ray-tile grid;
* each grid step streams a tile of rays through the full wall table,
  producing the min-distance (and argmin wall index) without ever
  materializing the ``[R, W]`` distance matrix in HBM.

On non-TPU backends the kernels run in interpreter mode (slow but exact),
so the whole suite remains CPU-testable; the jnp brute-force path in
``..geometry`` stays the semantic oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import EPS, INF
from .common import LANE, interpret as _interpret, round_up as _round_up

DEF_TILE_R = 512


def pack_walls(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pack wall segments into the kernel's ``[8, Wp]`` table.

    Rows: 0 ax, 1 ay, 2 v2x, 3 v2y, 4 cross_const (= v2x*ay - v2y*ax);
    rows 5-7 zero padding (sublane alignment). Degenerate (padding) walls
    have v2 == 0 and produce INF distances in-kernel.
    """
    w = a.shape[0]
    wp = _round_up(max(w, LANE), LANE)
    ax, ay = a[:, 0], a[:, 1]
    v2x = b[:, 0] - ax
    v2y = b[:, 1] - ay
    cross_const = v2x * ay - v2y * ax
    rows = jnp.stack([ax, ay, v2x, v2y, cross_const,
                      jnp.zeros_like(ax), jnp.zeros_like(ax),
                      jnp.zeros_like(ax)])
    return jnp.pad(rows, [(0, 0), (0, wp - w)]).astype(jnp.float32)


def _tile_wall_t(rays_ref, walls_ref):
    """[T, W] ray-segment distances for one ray tile vs the resident wall
    table (the single source of the intersection math in this module)."""
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    dx = rays_ref[:, 2:3]
    dy = rays_ref[:, 3:4]
    ax = walls_ref[0:1, :]
    ay = walls_ref[1:2, :]
    v2x = walls_ref[2:3, :]
    v2y = walls_ref[3:4, :]
    cross_const = walls_ref[4:5, :]

    dotp = v2y * dx - v2x * dy                        # [T, W]
    safe = jnp.where(jnp.abs(dotp) < EPS, 1.0, dotp)
    t1 = (v2x * oy - v2y * ox - cross_const) / safe
    t2 = ((oy * dx - ox * dy) - (ay * dx - ax * dy)) / safe
    valid = (jnp.abs(dotp) >= EPS) & (t1 >= EPS) & (t2 >= 0.0) & (t2 <= 1.0)
    return jnp.where(valid, t1, INF)


def _nearest_kernel(rays_ref, walls_ref, tmin_ref, idx_ref):
    """One ray tile vs all walls: min distance + argmin index."""
    t = _tile_wall_t(rays_ref, walls_ref)
    tmin_ref[:, 0] = jnp.min(t, axis=1)
    idx_ref[:, 0] = jnp.argmin(t, axis=1).astype(jnp.int32)


def _occlusion_kernel(rays_ref, walls_ref, tmin_ref):
    """Occlusion variant: min distance only (checkVis needs just the min)."""
    t = _tile_wall_t(rays_ref, walls_ref)
    tmin_ref[:, 0] = jnp.min(t, axis=1)


@functools.partial(jax.jit, static_argnames=("tile_r",))
def nearest_hit_pallas(o: jax.Array, d: jax.Array, walls_packed: jax.Array,
                       tile_r: int = DEF_TILE_R
                       ) -> Tuple[jax.Array, jax.Array]:
    """Fused nearest-wall pass: rays ``o,d [R, 2]`` vs the packed wall
    table. Returns ``(closest[R], hit_idx[R])`` with ``hit_idx == -1`` on
    miss — drop-in for geometry.pairwise + nearest_hit."""
    r = o.shape[0]
    rp = _round_up(max(r, tile_r), tile_r)
    rays = jnp.concatenate([o, d], axis=1).astype(jnp.float32)  # [R, 4]
    rays = jnp.pad(rays, [(0, rp - r), (0, 4)])                 # [Rp, 8]
    wp = walls_packed.shape[1]

    grid = (rp // tile_r,)
    tmin, idx = pl.pallas_call(
        _nearest_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(rays, walls_packed)
    closest = tmin[:r, 0]
    hit_idx = idx[:r, 0]
    return closest, jnp.where(closest >= INF, jnp.int32(-1), hit_idx)


@functools.partial(jax.jit, static_argnames=("tile_r",))
def occlusion_min_pallas(o: jax.Array, d: jax.Array,
                         walls_packed: jax.Array,
                         tile_r: int = DEF_TILE_R) -> jax.Array:
    """Fused occlusion pass: min wall distance along each shadow ray
    ``[N, 2]``. Shapes may carry extra leading dims (flattened internally).
    """
    lead = o.shape[:-1]
    o2 = o.reshape(-1, 2)
    d2 = d.reshape(-1, 2)
    r = o2.shape[0]
    rp = _round_up(max(r, tile_r), tile_r)
    rays = jnp.concatenate([o2, d2], axis=1).astype(jnp.float32)
    rays = jnp.pad(rays, [(0, rp - r), (0, 4)])
    wp = walls_packed.shape[1]

    grid = (rp // tile_r,)
    tmin = pl.pallas_call(
        _occlusion_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        interpret=_interpret(),
    )(rays, walls_packed)
    return tmin[:r, 0].reshape(lead)
