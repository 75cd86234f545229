"""Sequence parallelism: time-axis sharded convolution.

The long-sequence dimension of this domain is audio time — the dry clip
and the ``sampleRate * reverbDuration`` IR it is convolved against
(``AudioConvolve.compute:13-31`` brute-forces one GPU thread per output
sample). SURVEY.md section 5 names the honest "SP" design: shard the time
axis and ``psum`` partial convolutions. This module implements it with the
overlap-add identity:

    conv(x, ir) = sum_d shift(conv(x_d, ir), d * C)

where ``x = concat(x_0 .. x_{D-1})`` in chunks of ``C``. Each device
FFT-convolves only its chunk (cost ``O((C+T) log)`` instead of
``O((N+T) log)``), places the partial at its time offset, and the psum
over ICI reassembles the exact full convolution. Gating (the reference's
``|x| <= eps`` input skip) is element-wise on ``x`` so it commutes with
chunking.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import convolve as cv


def convolve_seq_sharded(dry: jax.Array, ir: jax.Array, mesh: Mesh,
                         accum_count: jax.Array | int = 1, *,
                         axis: str = "rays",
                         gate_eps: Optional[float] = cv.EPS) -> jax.Array:
    """Full convolution ``[N] x [T] -> [N+T]`` with the dry clip sharded
    along time across ``mesh[axis]`` — numerically equivalent to
    :func:`~..ops.convolve.convolve_fft` (same length, gating, accumCount
    normalization) up to float summation order.

    ``N`` must divide evenly by the axis size. The IR is replicated
    (reverb tails make every chunk's output overlap its neighbors by
    ``T``; the psum performs the overlap-add).
    """
    n = dry.shape[-1]
    t = ir.shape[-1]
    n_dev = mesh.shape[axis]
    if n % n_dev != 0:
        raise ValueError(f"clip length {n} not divisible by {axis}={n_dev}")
    chunk = n // n_dev
    other_axes = tuple(a for a in mesh.axis_names if a != axis)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis),), out_specs=P(),
             check_vma=False)
    def run(x):
        d = jax.lax.axis_index(axis)
        local = cv.convolve_fft(x[0], ir, accum_count,
                                gate_eps=gate_eps)        # [chunk + T]
        out = jnp.zeros((n + t,), local.dtype)
        out = jax.lax.dynamic_update_slice(out, local, (d * chunk,))
        total = jax.lax.psum(out, axis)
        for a in other_axes:
            total = jax.lax.pmean(total, a)
        return total

    return run(dry.reshape(n_dev, chunk))
