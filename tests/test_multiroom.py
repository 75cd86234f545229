"""BASELINE.json config #2: polygonal multi-room scene (exported-collider
JSON) with per-material frequency-band absorption, traced banded end-to-end."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.cli import load_scene_json
from realisticaudioraytracing2d_tpu.engine import Engine
from realisticaudioraytracing2d_tpu.utils.audio_io import click_clip

MULTIROOM = {
    "n_bands": 4,
    "source": [-8.0, 0.0],
    "listener": [8.0, 0.0],
    "listener_radius": 0.6,
    "colliders": [
        # outer shell: one polygon path (two rooms joined, non-convex)
        {"type": "polygon",
         "paths": [[[-12, -5], [12, -5], [12, 5], [2, 5], [2, 8],
                    [-2, 8], [-2, 5], [-12, 5]]],
         "material": {"absorption": 0.3, "scattering": 0.4,
                      "transmission": 0.1, "ior": 0.5,
                      "band_absorption": [0.15, 0.25, 0.45, 0.7]}},
        # dividing wall with a doorway (two boxes), transmissive
        {"type": "box", "position": [0.0, 3.2], "scale": [1.0, 3.6],
         "material": {"absorption": 0.2, "scattering": 0.8,
                      "transmission": 0.5, "ior": 0.8}},
        {"type": "box", "position": [0.0, -3.2], "scale": [1.0, 3.6],
         "material": {"absorption": 0.2, "scattering": 0.8,
                      "transmission": 0.5, "ior": 0.8}},
        # round pillar in the right room
        {"type": "circle", "position": [5.0, -1.0], "radius": 0.8,
         "resolution": 16,
         "material": {"absorption": 0.1, "scattering": 1.0,
                      "transmission": 0.0, "ior": 1.0}},
    ],
}


@pytest.fixture(scope="module")
def room():
    return load_scene_json(MULTIROOM)


def test_schema_loads(room):
    # 8 shell edges + 2 boxes x 4 + 16 circle segments = 32 walls
    assert int(np.asarray(room.scene.n_valid)) == 32
    assert room.scene.n_bands == 4
    # shell band absorption honored
    np.testing.assert_allclose(np.asarray(room.scene.absorption)[0],
                               [0.15, 0.25, 0.45, 0.7])


def test_banded_multiroom_trace_and_bake(room):
    cfg = art.EngineConfig(
        sim=art.SimConfig(ray_count=2048, max_bounces=6, n_bands=4),
        audio=art.AudioConfig(sample_rate=8000, reverb_duration=0.3))
    eng = Engine(room.scene, cfg)
    p = eng.params(room.source, room.listener)
    st = eng.trace_frames(p, jax.random.PRNGKey(0), n_frames=2)
    ir = np.asarray(st.normalized())[0]   # [T, 4]
    assert ir.sum() > 0
    # high bands decay faster than low bands in the reverb tail
    tail = ir[ir.shape[0] // 3:]
    band_e = tail.sum(axis=0)
    assert band_e[0] > band_e[-1]
    # sound reaches the listener through the doorway/wall: some energy
    # arrives later than the straight-line time (reverberant field)
    nz = np.nonzero(ir.sum(axis=1))[0]
    straight = (16.0 - 0.6) / 343.0 * 8000
    assert nz[0] >= straight * 0.8
    assert len(nz) > 50

    dry = jnp.asarray(click_clip(0.1, 8000, click_times=(0.01,)))
    wet = np.asarray(eng.bake(dry, st))
    assert np.abs(wet).max() == pytest.approx(1.0, rel=1e-4)


def test_scene_json_via_cli(tmp_path):
    import os

    from realisticaudioraytracing2d_tpu.cli import main
    sj = str(tmp_path / "multiroom.json")
    with open(sj, "w") as f:
        json.dump(MULTIROOM, f)
    out = str(tmp_path / "ir.png")
    main(["trace", "--scene-json", sj, "--rays", "512", "--bounces", "4",
          "--frames", "1", "--reverb", "0.2", "--sample-rate", "8000",
          "--out", out])
    assert os.path.exists(out)
