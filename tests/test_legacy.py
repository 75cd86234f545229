"""Legacy frequency-binned pipeline tests (RaytraceOcclusion2D parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realisticaudioraytracing2d_tpu.models.rooms import smoll_room
from realisticaudioraytracing2d_tpu.ops import legacy
from realisticaudioraytracing2d_tpu.ops.trace import (Hits, TraceParams,
                                                      trace_hits_only)
from tests.test_ir import make_hits


def test_muffle_factor_placeholder():
    hits = make_hits([0.01], [0.25], [True])
    m = np.asarray(legacy.hit_muffle_factors(hits))
    assert m.reshape(-1)[0] == pytest.approx(0.75)


def test_scatter_legacy_oracle():
    # one hit: energy 2.0, delay 0.5 s at SR=1000, window 4 -> time bin 125
    sr, t_bins, w, scale = 1000, 200, 4, 5.0
    hits = make_hits([0.5], [2.0], [True])
    ir = np.asarray(legacy.scatter_hits_legacy(hits, sr, t_bins, w, scale))
    assert ir.shape == (1, t_bins, 4)
    muffle = 1.0 - 2.0
    want = 2.0 * np.exp(-muffle * np.arange(4) * scale / w)
    np.testing.assert_allclose(ir[0, 125], want, rtol=1e-5)
    assert np.abs(ir[0]).sum() == pytest.approx(np.abs(want).sum())


def test_scatter_legacy_bounds():
    hits = make_hits([10.0, -1.0], [1.0, 1.0], [True, True])
    ir = np.asarray(legacy.scatter_hits_legacy(hits, 1000, 8, 4))
    assert ir.sum() == 0.0


def test_accumulate_legacy_and_normalize():
    st = legacy.LegacyIRState.zeros(16, 1, 8)
    hits = make_hits([0.01], [0.5], [True])
    st = legacy.accumulate_legacy(st, hits, 1000)
    st = legacy.accumulate_legacy(st, hits, 1000)
    assert int(st.frames) == 2
    np.testing.assert_allclose(np.asarray(st.normalized()) * 2,
                               np.asarray(st.sum), rtol=1e-6)


def test_legacy_end_to_end_from_trace():
    room = smoll_room()
    p = TraceParams.make(room.source, room.listener, 0.5, 343.0, 1.0)
    hits = trace_hits_only(room.scene, p, jax.random.PRNGKey(0),
                           n_rays=1024, max_bounces=5)
    st = legacy.LegacyIRState.zeros(256, 1, 32)
    st = legacy.accumulate_legacy(st, hits, 8000)
    ir = np.asarray(st.normalized())
    assert ir.sum() > 0
    # HF muffle: band 0 carries the most energy
    band_energy = ir[0].sum(axis=0)
    assert band_energy[0] == band_energy.max()
    assert band_energy[-1] < band_energy[0]


def test_legacy_to_time_domain():
    sr, t_bins, w = 8000, 64, 32
    st = legacy.LegacyIRState.zeros(t_bins, 1, w)
    hits = make_hits([0.1], [1.0], [True])   # time bin floor(800/32)=25
    st = legacy.accumulate_legacy(st, hits, sr)
    td = np.asarray(legacy.legacy_ir_to_time_domain(st.normalized(), sr,
                                                    t_bins * w, w))
    assert td.shape == (1, t_bins * w)
    assert np.abs(td).sum() > 0
    # energy concentrates near the hit's time offset 25*32 = 800
    center = np.abs(td[0][780:880]).sum()
    assert center > 0.5 * np.abs(td[0]).sum()
