"""First-order edge diffraction (ops/diffraction.py).

Fixture: an opaque vertical barrier between source and listener — the
trace alone leaves the listener in a hard shadow; the diffraction pass
must fill it with the Maekawa-attenuated bent path around the barrier
tip(s).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from realisticaudioraytracing2d_tpu.models.materials import AudioMaterial
from realisticaudioraytracing2d_tpu.models.scene import (SceneBuilder,
                                                         Transform2D)
from realisticaudioraytracing2d_tpu.ops import diffraction
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams

OPAQUE = AudioMaterial(absorption=0.9, scattering=0.5, transmission=0.0,
                       ior=1.0)
SR = 8000
C = 343.0


def barrier_scene(n_bands=1, split=False):
    """A single vertical barrier from (0, -4) to (0, 4) as one polygon
    wall (or two collinear halves when ``split``)."""
    b = SceneBuilder(n_bands=n_bands)
    if split:
        b.add_segment((0.0, -4.0), (0.0, 0.0), (1.0, 0.0), OPAQUE)
        b.add_segment((0.0, 0.0), (0.0, 4.0), (1.0, 0.0), OPAQUE)
    else:
        b.add_segment((0.0, -4.0), (0.0, 4.0), (1.0, 0.0), OPAQUE)
    return b.build()


def params(src=(-3.0, 0.0), lis=(3.0, 0.0)):
    return TraceParams.make(np.asarray(src, np.float32),
                            np.asarray(lis, np.float32),
                            listener_radius=0.5, speed_of_sound=C)


def bent_path_len(src, edge, lis):
    src, edge, lis = (np.asarray(x, np.float64) for x in (src, edge, lis))
    return np.linalg.norm(edge - src) + np.linalg.norm(lis - edge)


def test_shadow_zone_gets_energy_at_the_right_delay():
    scene = barrier_scene()
    p = params()
    ir = np.asarray(diffraction.diffraction_ir(
        scene, p, sample_rate=SR, ir_length=SR // 2))
    assert ir.sum() > 0
    # Two symmetric paths around (0, +-4); both land in the same bin.
    d = bent_path_len((-3, 0), (0, 4), (3, 0))
    expect_bin = int(np.floor(d / C * SR))
    hot = np.flatnonzero(ir[0, :, 0])
    assert list(hot) == [expect_bin]
    # Energy: two edges, each weight 1, spreading 1/d^2, Maekawa 1/(3+20N)
    delta = d - 6.0
    from realisticaudioraytracing2d_tpu.ops.air import band_frequencies
    n = 2 * delta * band_frequencies(1)[0] / C
    expect = 2 * (1.0 / d ** 2) / (3 + 20 * n)
    assert ir[0, expect_bin, 0] == pytest.approx(expect, rel=1e-4)


def test_no_contribution_when_line_of_sight_clear():
    scene = barrier_scene()
    p = params(src=(-3.0, 6.0), lis=(3.0, 6.0))   # both above the barrier
    ir = np.asarray(diffraction.diffraction_ir(
        scene, p, sample_rate=SR, ir_length=SR // 2))
    assert ir.sum() == 0.0


def test_split_collinear_barrier_matches_single():
    # The interior seam at (0,0) must not diffract; the outer tips give
    # exactly the single-barrier result.
    p = params()
    ir1 = np.asarray(diffraction.diffraction_ir(
        barrier_scene(), p, sample_rate=SR, ir_length=SR // 2))
    ir2 = np.asarray(diffraction.diffraction_ir(
        barrier_scene(split=True), p, sample_rate=SR, ir_length=SR // 2))
    np.testing.assert_allclose(ir2, ir1, rtol=1e-5)


def test_higher_bands_attenuate_more():
    scene = barrier_scene(n_bands=4)
    ir = np.asarray(diffraction.diffraction_ir(
        scene, params(), sample_rate=SR, ir_length=SR // 2))
    per_band = ir[0].sum(axis=0)
    assert np.all(np.diff(per_band) < 0)          # monotone in frequency


def test_deeper_shadow_attenuates_more():
    scene = barrier_scene()
    shallow = np.asarray(diffraction.diffraction_ir(
        scene, params(lis=(3.0, 0.0)), sample_rate=SR,
        ir_length=SR)).sum()
    # Hug the barrier: much longer detour around the tips.
    deep = np.asarray(diffraction.diffraction_ir(
        scene, params(src=(-0.3, 0.0), lis=(0.3, 0.0)), sample_rate=SR,
        ir_length=SR)).sum()
    assert deep < shallow


def test_multi_listener_axis():
    scene = barrier_scene()
    # second listener shares the source's side of the barrier (clear LOS)
    p = TraceParams.make(np.asarray((-3.0, 0.0), np.float32),
                         np.asarray([[3.0, 0.0], [-3.0, 6.0]], np.float32),
                         speed_of_sound=C)
    ir = np.asarray(diffraction.diffraction_ir(
        scene, p, sample_rate=SR, ir_length=SR // 2))
    assert ir.shape[0] == 2
    assert ir[0].sum() > 0          # shadowed listener
    assert ir[1].sum() == 0.0       # clear line of sight


def test_edge_table_weights():
    scene = barrier_scene(split=True)
    pts, w = diffraction.edge_table(scene)
    w = np.asarray(w)
    pts = np.asarray(pts)
    seam = np.isclose(pts, [0.0, 0.0]).all(axis=-1)
    tips = (np.isclose(pts, [0.0, 4.0]).all(axis=-1)
            | np.isclose(pts, [0.0, -4.0]).all(axis=-1))
    assert np.all(w[seam] == 0.0)
    assert np.all(w[tips & (w > 0)] == 1.0)
    # padding endpoints carry no weight
    pad = ~np.asarray(np.concatenate([scene.mask, scene.mask]))
    assert np.all(w[pad] == 0.0)


def test_doubled_wall_counts_edges_once():
    # A 2-point closed polygon "loop" yields two coincident opposite
    # walls (the builder's loop closure); multiplicity weighting must
    # make it diffract exactly like the single thin wall.
    b = SceneBuilder(n_bands=1)
    b.add_polygon([np.array([[0.0, -4.0], [0.0, 4.0]])], OPAQUE,
                  Transform2D())
    doubled = b.build()
    p = params()
    ir_single = np.asarray(diffraction.diffraction_ir(
        barrier_scene(), p, sample_rate=SR, ir_length=SR // 2))
    ir_doubled = np.asarray(diffraction.diffraction_ir(
        doubled, p, sample_rate=SR, ir_length=SR // 2))
    np.testing.assert_allclose(ir_doubled, ir_single, rtol=1e-5)


def test_stream_chunk_diffraction_and_air():
    # The streaming step can fold both physics addenda into its per-chunk
    # IR, entirely inside the compiled program.
    import jax
    from realisticaudioraytracing2d_tpu.streaming import (init_stream,
                                                          stream_chunk)

    scene = barrier_scene()
    p = params()
    dry = jnp.ones(256, jnp.float32)
    key = jax.random.PRNGKey(0)
    kw = dict(n_rays=64, max_bounces=2, sample_rate=SR)

    out_plain, _ = stream_chunk(scene, p, init_stream(1024, 256), dry,
                                key, **kw)
    # hard shadow: barrier is opaque, nothing reflects around it
    assert float(np.abs(np.asarray(out_plain)).sum()) == 0.0

    out_diff, _ = stream_chunk(scene, p, init_stream(1024, 256), dry,
                               key, diffraction=True, **kw)
    e_diff = float(np.abs(np.asarray(out_diff)).sum())
    assert e_diff > 0.0

    out_air, _ = stream_chunk(scene, p, init_stream(1024, 256), dry, key,
                              diffraction=True,
                              air_alpha=jnp.asarray([5.0]), **kw)
    assert 0.0 < float(np.abs(np.asarray(out_air)).sum()) < e_diff


def test_live_wet_chunk_diffraction():
    import jax
    from realisticaudioraytracing2d_tpu.live import wet_chunk

    scene = barrier_scene()
    p = params()
    prev = jnp.zeros((1, 1024, 1), jnp.float32)
    dry = jnp.ones(256, jnp.float32)
    wet, cur, _ = wet_chunk(scene, p, prev, dry, jax.random.PRNGKey(0),
                            jnp.asarray(0, jnp.int32), n_rays=64,
                            max_bounces=2, sample_rate=SR,
                            diffraction=True)
    assert float(np.asarray(cur).sum()) > 0.0
    assert float(np.abs(np.asarray(wet)).sum()) > 0.0


def thick_box_scene():
    b = SceneBuilder(n_bands=1)
    b.add_box(OPAQUE, Transform2D(position=(0.0, -1.0)), size=(1.0, 6.0))
    return b.build()


def test_second_order_rounds_a_thick_box():
    # First order cannot round a box (the bent path clips the far
    # corner); the edge-to-edge cascade can.
    scene = thick_box_scene()
    p = params(src=(-3.0, 0.0), lis=(3.0, 0.0))
    ir1 = np.asarray(diffraction.diffraction_ir(
        scene, p, sample_rate=SR, ir_length=SR // 2, order=1))
    ir2 = np.asarray(diffraction.diffraction_ir(
        scene, p, sample_rate=SR, ir_length=SR // 2, order=2))
    assert ir1.sum() == 0.0
    assert ir2.sum() > 0.0
    # The dominant path goes over the two top corners (+-0.5, 2): check
    # the arrival bin.
    d = (np.linalg.norm([-3 - -0.5, 0 - 2.0])
         + 1.0 + np.linalg.norm([3 - 0.5, 2.0]))
    expect_bin = int(np.floor(d / C * SR))
    assert np.flatnonzero(ir2[0, :, 0])[0] == expect_bin


def test_second_order_weaker_than_first_on_thin_barrier():
    # On a thin barrier first order dominates; the added second-order
    # family must be a small positive correction.
    scene = barrier_scene()
    p = params()
    ir1 = np.asarray(diffraction.diffraction_ir(
        scene, p, sample_rate=SR, ir_length=SR // 2, order=1))
    ir2 = np.asarray(diffraction.diffraction_ir(
        scene, p, sample_rate=SR, ir_length=SR // 2, order=2))
    extra = ir2.sum() - ir1.sum()
    assert 0.0 <= extra < 0.25 * ir1.sum()


def test_order_validation():
    with pytest.raises(ValueError):
        diffraction.diffraction_ir(barrier_scene(), params(),
                                   sample_rate=SR, ir_length=128, order=3)


def test_diffraction_polylines_render():
    from realisticaudioraytracing2d_tpu.utils import viz
    scene = barrier_scene()
    p = params()
    polys = viz.diffraction_polylines(scene, p)
    assert len(polys) == 2                      # the two barrier tips
    tips = sorted(tuple(np.round(pl[1], 3)) for pl in polys)
    assert tips == [(0.0, -4.0), (0.0, 4.0)]
    img = viz.render_scene(scene, np.asarray(p.source),
                           np.asarray(p.listeners)[0], 0.5,
                           extra_paths=polys)
    blank = viz.render_scene(scene, np.asarray(p.source),
                             np.asarray(p.listeners)[0], 0.5)
    assert img.sum() > blank.sum()              # paths actually drawn
    polys2 = viz.diffraction_polylines(thick_box_scene(),
                                       params(src=(-3.0, 0.0),
                                              lis=(3.0, 0.0)), order=2)
    assert any(len(pl) == 4 for pl in polys2)   # 2nd-order S-E1-E2-L
