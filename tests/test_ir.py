"""IR scatter/accumulation tests (ProcessHits semantics + determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realisticaudioraytracing2d_tpu.models.rooms import smoll_room
from realisticaudioraytracing2d_tpu.ops import ir as irm
from realisticaudioraytracing2d_tpu.ops.trace import Hits, TraceParams, trace


def make_hits(delays, energies, valids, n_listeners=1, n_bands=1):
    """Hand-build a Hits pytree with shape [1, 1, N, L] from flat lists."""
    n = len(delays)
    delay = jnp.asarray(delays, jnp.float32).reshape(1, 1, n, 1)
    delay = jnp.broadcast_to(delay, (1, 1, n, n_listeners))
    energy = jnp.asarray(energies, jnp.float32).reshape(1, 1, n, 1, 1)
    energy = jnp.broadcast_to(energy, (1, 1, n, n_listeners, n_bands))
    valid = jnp.asarray(valids, bool).reshape(1, 1, n, 1)
    valid = jnp.broadcast_to(valid, (1, 1, n, n_listeners))
    return Hits(delay=delay, energy=energy, valid=valid)


def test_scatter_bins_and_sums():
    sr, T = 1000, 16
    # delays 1ms, 1.5ms (same bin 1), 3.2ms (bin 3)
    hits = make_hits([0.001, 0.0015, 0.0032], [1.0, 2.0, 4.0],
                     [True, True, True])
    ir = np.asarray(irm.scatter_hits(hits, sr, T))[0, :, 0]
    want = np.zeros(T)
    want[1] = 3.0
    want[3] = 4.0
    np.testing.assert_allclose(ir, want)


def test_scatter_drops_invalid_and_out_of_range():
    sr, T = 1000, 8
    hits = make_hits([0.001, 0.1, -0.5, 0.002], [1.0, 1.0, 1.0, 7.0],
                     [True, True, True, False])
    ir = np.asarray(irm.scatter_hits(hits, sr, T))[0, :, 0]
    assert ir.sum() == pytest.approx(1.0)  # only the first survives


def test_scatter_numpy_oracle_fuzz(rng):
    sr, T = 48000, 512
    n = 300
    delays = rng.uniform(-0.002, 0.012, n)
    energies = rng.uniform(0, 1, n)
    valids = rng.uniform(0, 1, n) > 0.3
    hits = make_hits(delays, energies, valids)
    got = np.asarray(irm.scatter_hits(hits, sr, T))[0, :, 0]
    want = np.zeros(T)
    for d, e, v in zip(delays, energies, valids):
        b = int(np.floor(np.float32(d) * sr))
        if v and 0 <= b < T:
            want[b] += np.float32(e)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_accumulate_frames():
    st = irm.IRState.zeros(16, 1, 1)
    hits = make_hits([0.5 / 16], [2.0], [True])  # sr=1 below -> bin 0
    st = irm.accumulate(st, hits, 1)
    st = irm.accumulate(st, hits, 1)
    assert int(st.frames) == 2
    assert float(st.sum.sum()) == pytest.approx(4.0)
    np.testing.assert_allclose(np.asarray(st.normalized()).sum(), 2.0)


def test_ir_determinism_bit_identical():
    # SURVEY.md section 5: the reference's scatter is racy; ours must be
    # bit-deterministic across reruns.
    room = smoll_room()
    p = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)

    def build():
        hits, _ = trace(room.scene, p, jax.random.PRNGKey(9), n_rays=2048,
                        max_bounces=5)
        return np.asarray(irm.scatter_hits(hits, 48000, 72000))

    a, b = build(), build()
    np.testing.assert_array_equal(a, b)
    assert a.sum() > 0


def test_banded_scatter():
    sr, T = 1000, 8
    hits = make_hits([0.001], [1.0], [True], n_bands=4)
    ir = np.asarray(irm.scatter_hits(hits, sr, T))
    assert ir.shape == (1, T, 4)
    np.testing.assert_allclose(ir[0, 1], np.ones(4))


def test_multi_listener_scatter_independent():
    sr, T = 1000, 8
    n = 2
    delay = jnp.asarray([[0.001, 0.003]], jnp.float32).reshape(1, 1, 1, 2)
    energy = jnp.asarray([[1.0, 5.0]], jnp.float32).reshape(1, 1, 1, 2, 1)
    valid = jnp.asarray([[True, True]]).reshape(1, 1, 1, 2)
    hits = Hits(delay=delay, energy=energy, valid=valid)
    ir = np.asarray(irm.scatter_hits(hits, sr, T))
    assert ir.shape == (2, T, 1)
    assert ir[0, 1, 0] == 1.0 and ir[0].sum() == 1.0
    assert ir[1, 3, 0] == 5.0 and ir[1].sum() == 5.0


def test_muffle_band_energies_matches_legacy_formula():
    # RaytraceOcclusion2D.compute:248
    e = jnp.asarray([2.0])
    m = jnp.asarray([0.7])
    out = np.asarray(irm.muffle_band_energies(e, m, 4, muffle_scale=5.0))[0]
    want = 2.0 * np.exp(-0.7 * np.arange(4) * 5.0 / 4)
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_rasterize_ir_bar_heights():
    T, H, W = 64, 32, 64
    ir = jnp.zeros(T).at[10].set(0.5)
    img = np.asarray(irm.rasterize_ir(ir, jnp.asarray(1), gain=1.0,
                                      width=W, height=H))
    assert img.shape == (H, W)
    col = img[:, 10]  # column sampling bin 10
    # bar spans 0.1*H < y < 0.1*H + 0.5*H
    assert col.sum() == pytest.approx(
        np.sum((np.arange(H) > 3.2) & (np.arange(H) < 0.1 * H + 0.5 * H)))
    assert img[:, 30].sum() == 0  # empty bin -> no bar
