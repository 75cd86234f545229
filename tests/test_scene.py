"""Scene builder tests: collider-flattening parity with SceneHelper.cs."""

import math

import numpy as np
import pytest

from realisticaudioraytracing2d_tpu.models.materials import (
    MATERIAL_BORDER, MATERIAL_INTERIOR, AudioMaterial)
from realisticaudioraytracing2d_tpu.models.rooms import (big_room,
                                                         random_rooms,
                                                         sample_scene,
                                                         shoebox_room,
                                                         smoll_room)
from realisticaudioraytracing2d_tpu.models.scene import (Scene, SceneBuilder,
                                                         Transform2D)


def test_box_flattening_corners_and_normals():
    # Unit box at origin: SceneHelper.cs:49-57 corner order, outward normals
    # via (dir.y, -dir.x) (SceneHelper.cs:92-93).
    s = SceneBuilder().add_box(MATERIAL_BORDER).build(pad_to=4)
    a = np.asarray(s.a)
    b = np.asarray(s.b)
    n = np.asarray(s.normal)
    np.testing.assert_allclose(a[0], [-0.5, -0.5], atol=1e-6)
    np.testing.assert_allclose(b[0], [0.5, -0.5], atol=1e-6)
    # bottom edge runs +x; normal = (dir.y, -dir.x) = (0, -1): outward (down)
    np.testing.assert_allclose(n[0], [0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(n[1], [1.0, 0.0], atol=1e-6)   # right
    np.testing.assert_allclose(n[2], [0.0, 1.0], atol=1e-6)   # top
    np.testing.assert_allclose(n[3], [-1.0, 0.0], atol=1e-6)  # left


def test_box_transform_scale_rotation():
    tf = Transform2D(position=(2.0, 3.0), angle=math.pi / 2, scale=(4.0, 2.0))
    s = SceneBuilder().add_box(MATERIAL_BORDER, tf).build(pad_to=4)
    a = np.asarray(s.a)
    # local (-0.5,-0.5) -> scaled (-2,-1) -> rot90 (1,-2) -> +pos (3,1)
    np.testing.assert_allclose(a[0], [3.0, 1.0], atol=1e-5)


def test_negative_scale_flips_winding():
    tf = Transform2D(scale=(-1.0, 1.0))
    s = SceneBuilder().add_box(MATERIAL_BORDER, tf).build(pad_to=4)
    n = np.asarray(s.normal)
    # mirrored box: loop runs the other way in world space AND winding sign
    # flips, so bottom edge normal must still point outward... the reference
    # formula gives normal = (dir.y, -dir.x) * sign(sx*sy).
    # bottom edge: start=(0.5,-0.5) end=(-0.5,-0.5), dir=(-1,0),
    # normal=(0,1)*(-1)=(0,-1): still outward.
    np.testing.assert_allclose(n[0], [0.0, -1.0], atol=1e-6)


def test_circle_tessellation_32():
    s = SceneBuilder().add_circle(MATERIAL_BORDER, radius=2.0).build()
    assert int(np.asarray(s.mask).sum()) == 32  # SceneHelper.cs:26
    a = np.asarray(s.a)[:32]
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 2.0, atol=1e-5)
    # normals point outward for CCW tessellation? (dir.y,-dir.x) of CCW loop
    # points away from center:
    n = np.asarray(s.normal)[:32]
    mid = (a + np.asarray(s.b)[:32]) / 2
    assert np.all(np.sum(n * mid, axis=1) > 0)


def test_polygon_paths():
    tri = np.array([[0, 0], [1, 0], [0, 1]], float)
    sq = np.array([[2, 2], [3, 2], [3, 3], [2, 3]], float)
    s = SceneBuilder().add_polygon([tri, sq], MATERIAL_BORDER).build()
    assert int(np.asarray(s.mask).sum()) == 7


def test_padding_is_inert_and_bucketed():
    s = SceneBuilder().add_box(MATERIAL_BORDER).build(pad_multiple=8)
    assert s.n_walls == 8
    assert int(np.asarray(s.mask).sum()) == 4
    pad_a = np.asarray(s.a)[4:]
    pad_b = np.asarray(s.b)[4:]
    np.testing.assert_array_equal(pad_a, pad_b)  # degenerate -> INF always


def test_pad_to_method():
    s = SceneBuilder().add_box(MATERIAL_BORDER).build(pad_to=4)
    s2 = s.pad_to(16)
    assert s2.n_walls == 16
    assert int(np.asarray(s2.n_valid)) == 4
    np.testing.assert_array_equal(np.asarray(s2.a[:4]), np.asarray(s.a))
    with pytest.raises(ValueError):
        s.pad_to(2)


def test_material_columns():
    s = SceneBuilder().add_box(MATERIAL_INTERIOR).build(pad_to=4)
    assert np.allclose(np.asarray(s.absorption)[:4], 0.148)
    assert np.allclose(np.asarray(s.scattering)[:4], 1.0)
    assert np.allclose(np.asarray(s.transmission)[:4], 1.0)
    assert np.allclose(np.asarray(s.ior)[:4], 0.6)


def test_banded_scene():
    mat = AudioMaterial(absorption=0.2, band_absorption=(0.1, 0.2, 0.4),
                        name="b3")
    s = SceneBuilder(n_bands=3).add_box(mat).build(pad_to=4)
    assert s.n_bands == 3
    np.testing.assert_allclose(np.asarray(s.absorption)[0], [0.1, 0.2, 0.4])


def test_smoll_room_fixture():
    room = smoll_room()
    assert int(np.asarray(room.scene.n_valid)) == 20  # 5 boxes x 4 edges
    np.testing.assert_allclose(room.source, [-18.0, 9.0])
    np.testing.assert_allclose(room.listener, [0.0, -3.68])
    assert room.listener_radius == 0.5
    # Top wall of "Wall" (pos (0,10), scale (100,1)): corners at y=9.5/10.5,
    # x = +-50.
    a = np.asarray(room.scene.a)
    assert a[:20, 0].min() == pytest.approx(-50.0, abs=1e-3)
    assert a[:20, 0].max() == pytest.approx(50.01, abs=1e-2)


def test_big_room_is_10x():
    # Wall *centers* scale 10x (thickness stays 1, per the scene YAML).
    small = smoll_room()
    big = big_room()
    sm = (np.asarray(small.scene.a)[:16] + np.asarray(small.scene.b)[:16]) / 2
    bm = (np.asarray(big.scene.a)[:16] + np.asarray(big.scene.b)[:16]) / 2
    # box centers: mean over each box's 4 edge midpoints
    sc = sm.reshape(4, 4, 2).mean(1)
    bc = bm.reshape(4, 4, 2).mean(1)
    np.testing.assert_allclose(bc, sc * 10.0, atol=0.2)
    np.testing.assert_allclose(big.source, [-183.8, 87.1])


def test_scene_concat_compacts_and_pads():
    b1 = SceneBuilder()
    b1.add_box(MATERIAL_BORDER)
    s1 = b1.build(pad_to=8)                 # 4 valid + 4 pad
    b2 = SceneBuilder()
    b2.add_box(MATERIAL_INTERIOR, Transform2D((3.0, 0.0)))
    s2 = b2.build(pad_to=6)                 # 4 valid + 2 pad
    m = s1.concat(s2)
    assert m.n_walls == 14                  # default: sum of padded sizes
    assert int(np.asarray(m.n_valid)) == 8  # valid walls compacted first
    assert bool(np.asarray(m.mask)[:8].all())
    assert not np.asarray(m.mask)[8:].any()
    # materials carried through in order
    np.testing.assert_allclose(np.asarray(m.absorption)[0, 0], 0.507,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.absorption)[4, 0], 0.148,
                               atol=1e-6)
    # explicit pad_to and band mismatch guard
    assert s1.concat(s2, pad_to=16).n_walls == 16
    s3 = SceneBuilder(n_bands=2).add_box(MATERIAL_BORDER).build()
    with pytest.raises(ValueError):
        s1.concat(s3)


def test_sample_scene_fixture_repaired():
    # SampleScene.unity:152-175, repaired (Border material on all walls —
    # the reference scene would NPE in ResolveMaterial).
    room = sample_scene()
    assert int(np.asarray(room.scene.n_valid)) == 12  # 3 boxes x 4 edges
    np.testing.assert_allclose(room.source, [0.07, 10.01])
    np.testing.assert_allclose(room.listener, [0.0, -3.68])
    a = np.asarray(room.scene.a)[:12]
    # Wall (1)'s right edge is the scene's max x: 0.01 + 38.184124/2
    assert a[:, 0].max() == pytest.approx(0.01 + 38.184124 / 2, abs=1e-3)
    # slanted wall rotated ~77.2deg: tallest extent
    assert a[:, 1].max() == pytest.approx(
        1.34 + (27.576956 / 2) * np.sin(2 * np.arctan2(0.6239737, 0.7814454)),
        abs=0.6)
    # every wall is Border
    np.testing.assert_allclose(np.asarray(room.scene.absorption)[:12, 0],
                               0.507, atol=1e-6)


def test_random_rooms_batched():
    scenes, src, lis = random_rooms(4, seed=7, n_obstacles=2)
    assert np.asarray(scenes.a).shape[0] == 4
    assert np.asarray(scenes.a).shape[1] == 4 * 6  # padded uniform walls
    assert src.shape == (4, 2) and lis.shape == (4, 2)
    # all rooms share shapes -> single pytree, vmappable
    assert np.asarray(scenes.absorption).ndim == 3


def test_shoebox_room_closed():
    s = shoebox_room(20.0, 10.0)
    assert int(np.asarray(s.n_valid)) == 16
