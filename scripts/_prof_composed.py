"""Per-stage profile of the composed binaural + per-arrival chunk:
times each jitted stage (decode, arrival table, tap synthesis,
removal, crossfade, window) separately at the reference workload
shapes to locate the chunk's hotspot (this is how the _tap_chunk
gather was identified; docs/PERF.md carries the conclusions).
"""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu import spatial as spm
from realisticaudioraytracing2d_tpu import streaming as st
from realisticaudioraytracing2d_tpu.ops import convolve as cv

cfg = art.smoll_room_config()
sr = cfg.audio.sample_rate
T = cfg.audio.ir_length
n = cfg.audio.chunk_samples
K = 1
A = st._ARRIVAL_TAPS
early = int(round(st._ARRIVAL_WINDOW_S * sr))
wd = n + early + 2
rng = np.random.default_rng(0)

sp = jnp.asarray(np.abs(rng.normal(size=(3, T, K))).astype(np.float32))
ears = jnp.asarray(rng.normal(size=(2, T, K)).astype(np.float32))
dry = jnp.asarray(rng.normal(size=wd).astype(np.float32))
piece = dry[-n:]
idx = jnp.asarray(rng.integers(0, early, size=(1, A)), jnp.int32)
val = jnp.ones((1, A), bool)
g3 = jnp.asarray(np.abs(rng.normal(size=(1, A, 3, K))).astype(np.float32))
tau = idx.astype(jnp.float32)[:, :, None, None] + jnp.zeros((1, A, 3, K))
tau2 = jnp.concatenate([tau] * 4, axis=1)
tau2 = jnp.concatenate([tau2, tau2], axis=0)      # [2, 4A, 3, K]
g2 = jnp.concatenate([jnp.concatenate([g3] * 4, axis=1)] * 2, axis=0)
val2 = jnp.concatenate([jnp.concatenate([val] * 4, axis=1)] * 2, axis=0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    reps = 30
    for _i in range(reps):
        out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {dt:7.2f} ms")
    return dt


timeit("binaural_decode_ir [3,T,K]", lambda x: spm.binaural_decode_ir(
    x, sr, jnp.float32(0.3), 0.0875, 0.6, 343.0), sp)
timeit("arrival_table W", lambda w: st._arrival_table(w[:1, :, 0][..., None] * 1.0, early, A), sp)
timeit("window3 x2", lambda s, i: (st._window3(s[1:2], i),
                                   st._window3(s[2:3], i)), sp, idx)
timeit("remove_taps [3,T,K]", lambda s, i, v: st._remove_taps(
    s, jnp.tile(i, (3, 1)), jnp.tile(v, (3, 1))), sp, idx, val)
timeit("tap_chunk composed [2,4A,3,K]", lambda w, t0_, t1_, g0_, g1_, v: st._tap_chunk(
    w[None, :], t0_, t1_, g0_, g1_, v, n), dry, tau2, tau2, g2, g2, val2)
timeit("tap_chunk scalar [1,2A]", lambda w, t0_, g0_, v: st._tap_chunk(
    w[None, :], jnp.concatenate([t0_] * 2, 1), jnp.concatenate([t0_] * 2, 1),
    jnp.concatenate([g0_] * 2, 1), jnp.concatenate([g0_] * 2, 1),
    jnp.concatenate([v] * 2, 1), n), dry, tau, g3, val)
timeit("crossfaded_wet ears", st._crossfaded_wet, piece, ears, ears)
timeit("spatial_from_ir+match", lambda s, i, v, g: st._match_arrivals(
    i, v, i, g, v, 64.0), sp, idx, val, g3)
timeit("device_window", lambda d: st._device_window(d, wd, 0, 0, wd, False), dry)
timeit("gate_input", cv.gate_input, dry)
