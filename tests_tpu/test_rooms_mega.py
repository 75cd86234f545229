"""Rooms-batched mega kernel vs the jnp oracle sweep (statistical parity:
different — still key-deterministic — RNG streams), on the real chip."""

import jax
import numpy as np

from realisticaudioraytracing2d_tpu.models.rooms import random_rooms
from realisticaudioraytracing2d_tpu.parallel.sweep import sweep_rooms

SR = 16000
IR_LEN = 4096
KW = dict(n_rays=16384, max_bounces=4, sample_rate=SR, ir_length=IR_LEN,
          n_frames=4)


def test_rooms_mega_matches_jnp_sweep_statistically():
    scenes, sources, listeners = random_rooms(8, seed=2, n_obstacles=2)
    key = jax.random.PRNGKey(0)
    fused = np.asarray(sweep_rooms(scenes, sources, listeners, key,
                                   backend="fused", **KW))
    oracle = np.asarray(sweep_rooms(scenes, sources, listeners, key,
                                    backend="jnp", **KW))
    assert fused.shape == oracle.shape == (8, 1, IR_LEN, 1)
    ef = fused.sum(axis=(1, 2, 3))
    eo = oracle.sum(axis=(1, 2, 3))
    assert (eo > 0).all()
    rel = np.abs(ef - eo) / eo
    assert rel.max() < 0.08, f"per-room energy off: {rel}"
    # 16 ms coarse envelopes track per room
    win = SR // 64
    n = (IR_LEN // win) * win
    em = fused[..., :n, 0].reshape(8, -1, win).sum(-1)
    eg = oracle[..., :n, 0].reshape(8, -1, win).sum(-1)
    num = np.linalg.norm(em - eg, axis=-1)
    den = np.linalg.norm(eg, axis=-1)
    assert (num / den < 0.15).all()


def test_rooms_mega_deterministic_and_rooms_distinct():
    scenes, sources, listeners = random_rooms(4, seed=3, n_obstacles=1)
    key = jax.random.PRNGKey(9)
    kw = dict(n_rays=4096, max_bounces=4, sample_rate=SR,
              ir_length=2048, n_frames=2)
    a = np.asarray(sweep_rooms(scenes, sources, listeners, key,
                               backend="fused", **kw))
    b = np.asarray(sweep_rooms(scenes, sources, listeners, key,
                               backend="fused", **kw))
    np.testing.assert_array_equal(a, b)
    # distinct rooms -> distinct IRs (no block-indexing mixup)
    flat = a.reshape(4, -1)
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.allclose(flat[i], flat[j])
