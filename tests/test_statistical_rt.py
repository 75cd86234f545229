"""Cross-validation against independent statistical-acoustics oracles.

Two tracer-independent checks of the full transport + deposit model
(companions to ``test_image_source.py``, which pins early-reflection
*timing*; these pin the energy *decay*):

1. **Independent numpy random walk.** In a shoebox with FULLY DIFFUSE
   walls (scattering 1.0 — the tracer's ``arcsin(2u-1)`` draw is the
   exact 2D Lambert cosine law) and no interior obstacles, the room is
   convex, so NEE shadow rays are never occluded and the reference's
   physical model reduces to a ~50-line vectorized numpy walker: plane
   intersections, Lambert reflections, per-hit ``(1-alpha)`` absorption
   with the 1e-3 ray cutoff, direct capture ``E / max(1, d_total^2)``,
   NEE deposits ``E (1-alpha) cos+ / (2 d_total^2)`` with the 1e-5
   contribution cutoff (``Raytrace2D.compute:101-122``). It shares no
   code, no RNG, and no dtype (float64) with the tracer — yet with
   matched ray budgets the two Schroeder decay curves must agree.

2. **2D Eyring/Sabine bracket.** Transport in the diffuse shoebox is
   the ergodic billiard with mean free path ``l = pi * A / P`` (the 2D
   mean-chord-length theorem), so after compensating the deposits'
   ``1/d^2`` spreading (multiply bins by ``(c t)^2``) the remaining
   decay is ``E[(1-alpha)^N(t)]`` — bracketed below by Eyring
   (deterministic collision count, Jensen) and above by Sabine
   (Poisson collisions, more dispersed than billiard chords):

       RT_eyring = ln(1e6) * l / (c * (-ln(1 - alpha)))
       RT_sabine = ln(1e6) * l / (c * alpha)

   This is a closed-form geometric prediction with no Monte-Carlo
   anywhere.
"""

import numpy as np
import pytest

import jax

from realisticaudioraytracing2d_tpu.analysis import edc_db, rt60_t20
from realisticaudioraytracing2d_tpu.engine import trace_accumulate
from realisticaudioraytracing2d_tpu.models.materials import AudioMaterial
from realisticaudioraytracing2d_tpu.models.rooms import shoebox_room
from realisticaudioraytracing2d_tpu.ops.ir import IRState
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams

SR = 48000
C = 343.0
W, H = 8.0, 6.0
AREA, PERIM = W * H, 2 * (W + H)
SRC = np.array([-1.7, 1.2])
LIS = np.array([2.1, -1.4])
RADIUS = 0.3
N_RAYS = 80_000
N_FRAMES = 2
EPS = 1e-4  # ops/geometry.py EPS


def traced_ir(alpha: float, max_bounces: int, ir_len: int,
              gain: float = 1.0) -> np.ndarray:
    mat = AudioMaterial(absorption=alpha, scattering=1.0, transmission=0.0,
                        ior=1.0)
    scene = shoebox_room(W, H, wall_material=mat)
    p = TraceParams.make(SRC, LIS, listener_radius=RADIUS, speed_of_sound=C,
                         input_gain=gain)
    st = trace_accumulate(scene, p, IRState.zeros(ir_len),
                          jax.random.PRNGKey(7), n_rays=N_RAYS,
                          max_bounces=max_bounces, sample_rate=SR,
                          n_frames=N_FRAMES)
    return np.asarray(st.sum)[0, :, 0]


def walker_ir(alpha: float, max_bounces: int, ir_len: int,
              seed: int = 3) -> np.ndarray:
    """The independent oracle: same physical model, different code."""
    rng = np.random.default_rng(seed)
    hw, hh = W / 2, H / 2
    ir = np.zeros(ir_len + 1)  # last bin = discard slot
    for _ in range(N_FRAMES):
        ang = (np.arange(N_RAYS) + rng.random(N_RAYS)) / N_RAYS * 2 * np.pi
        d = np.stack([np.cos(ang), np.sin(ang)], -1)
        pos = np.tile(SRC.astype(np.float64), (N_RAYS, 1))
        E = np.ones(N_RAYS)
        dist = np.zeros(N_RAYS)
        alive = np.ones(N_RAYS, bool)
        for _b in range(max_bounces):
            with np.errstate(divide="ignore", invalid="ignore"):
                tx = np.where(d[:, 0] > 0, (hw - pos[:, 0]) / d[:, 0],
                              (-hw - pos[:, 0]) / d[:, 0])
                ty = np.where(d[:, 1] > 0, (hh - pos[:, 1]) / d[:, 1],
                              (-hh - pos[:, 1]) / d[:, 1])
            tx = np.where(d[:, 0] == 0, np.inf, tx)
            ty = np.where(d[:, 1] == 0, np.inf, ty)
            t = np.minimum(tx, ty)
            hit_x = tx < ty

            # direct capture before the wall (Common.hlsl circle test)
            tol = LIS - pos
            tca = (tol * d).sum(-1)
            d2 = (tol * tol).sum(-1) - tca * tca
            thc = np.sqrt(np.maximum(RADIUS * RADIUS - d2, 0.0))
            t0, t1 = tca - thc, tca + thc
            t_lis = np.where(t0 > EPS, t0, t1)
            cap = (alive & (tca >= 0.0) & (d2 <= RADIUS * RADIUS)
                   & (t_lis > EPS) & (t_lis < t))
            total_d = dist + t_lis
            e_direct = E / np.maximum(1.0, total_d * total_d)
            bins = np.floor(total_d / C * SR).astype(np.int64)
            ok = cap & (bins >= 0) & (bins < ir_len)
            np.add.at(ir, np.where(ok, bins, ir_len),
                      np.where(ok, e_direct, 0.0))

            # advance; inward normal of the hit plane
            pos = pos + d * t[:, None]
            dist = dist + t
            n = np.zeros_like(d)
            n[:, 0] = np.where(hit_x, -np.sign(d[:, 0]), 0.0)
            n[:, 1] = np.where(hit_x, 0.0, -np.sign(d[:, 1]))

            # NEE deposit (never occluded: convex room)
            tol = LIS - pos
            dl = np.sqrt(np.maximum((tol * tol).sum(-1), 1e-20))
            cos_t = np.maximum(0.0, (n * tol).sum(-1) / dl)
            tot = dist + dl
            nee = E * (1 - alpha) * 0.5 * cos_t / (tot * tot)
            nb = np.floor(tot / C * SR).astype(np.int64)
            okn = alive & (nee > 1e-5) & (nb >= 0) & (nb < ir_len)
            np.add.at(ir, np.where(okn, nb, ir_len),
                      np.where(okn, nee, 0.0))

            # absorb, cut, Lambert-reflect
            E = E * (1 - alpha)
            alive = alive & (E >= 1e-3)
            th = np.arcsin(np.clip(2 * rng.random(N_RAYS) - 1, -1.0, 1.0))
            cs, sn = np.cos(th), np.sin(th)
            d = np.stack([n[:, 0] * cs - n[:, 1] * sn,
                          n[:, 0] * sn + n[:, 1] * cs], -1)
            pos = pos + n * EPS
    return ir[:ir_len]


@pytest.fixture(scope="module")
def decay_pair():
    # alpha 0.5: rays die at the 1e-3 cutoff after 10 hits (~0.16 s),
    # well inside the 1/3 s window
    return (traced_ir(0.5, max_bounces=14, ir_len=SR // 3),
            walker_ir(0.5, max_bounces=14, ir_len=SR // 3))


def test_edc_matches_independent_walker(decay_pair):
    tr, wk = decay_pair
    db_tr = np.asarray(edc_db(tr))
    db_wk = np.asarray(edc_db(wk))
    sel = db_tr >= -30.0  # above the Monte-Carlo noise floor
    assert sel.sum() > 1000
    err = np.abs(db_tr[sel] - db_wk[sel])
    assert err.max() < 1.0, f"EDC diverges: max {err.max():.2f} dB"


def test_rt60_matches_independent_walker(decay_pair):
    tr, wk = decay_pair
    rt_tr = float(rt60_t20(tr, SR))
    rt_wk = float(rt60_t20(wk, SR))
    assert np.isfinite(rt_tr) and np.isfinite(rt_wk)
    assert abs(rt_tr - rt_wk) / rt_wk < 0.08, (rt_tr, rt_wk)


def test_compensated_decay_in_eyring_sabine_bracket():
    # Deposits are linear in input_gain while the 1e-5 NEE and 1e-3 ray
    # cutoffs are absolute (Raytrace2D.compute:111,122), so gain=1e3
    # pushes both cutoffs past ~22 wall hits (~0.35 s) — the T20 fit
    # window (-5..-25 dB of compensated decay, hits ~3..16) then sits
    # entirely inside untruncated transport.
    alpha = 0.3
    ir = traced_ir(alpha, max_bounces=26, ir_len=SR // 2, gain=1e3)
    t = (np.arange(ir.shape[0]) + 0.5) / SR
    compensated = ir * (C * t) ** 2  # undo deposit spreading
    rt = float(rt60_t20(compensated, SR))
    mfp = np.pi * AREA / PERIM
    rt_eyring = np.log(1e6) * mfp / (C * (-np.log1p(-alpha)))
    rt_sabine = np.log(1e6) * mfp / (C * alpha)
    assert np.isfinite(rt)
    assert 0.90 * rt_eyring < rt < 1.15 * rt_sabine, \
        (rt, rt_eyring, rt_sabine)
