"""Dynamic obstacles + stereo streaming (reference: dynamicObstacles flag
re-flattens colliders per FixedUpdate, RayTraceManager.cs:16,67)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import realisticaudioraytracing2d_tpu as art
from realisticaudioraytracing2d_tpu.models.materials import MATERIAL_BORDER
from realisticaudioraytracing2d_tpu.models.scene import (SceneBuilder,
                                                         Transform2D)
from realisticaudioraytracing2d_tpu.streaming import Streamer
from realisticaudioraytracing2d_tpu.utils.audio_io import noise_burst


def room_with_rotating_wall(angle):
    b = SceneBuilder()
    # enclosing box walls
    b.add_box(MATERIAL_BORDER, Transform2D((0, 6), 0, (30, 1)))
    b.add_box(MATERIAL_BORDER, Transform2D((0, -6), 0, (30, 1)))
    b.add_box(MATERIAL_BORDER, Transform2D((-15, 0), 0, (1, 12)))
    b.add_box(MATERIAL_BORDER, Transform2D((15, 0), 0, (1, 12)))
    # rotating interior obstacle
    b.add_box(MATERIAL_BORDER, Transform2D((3.0, 0.0), angle, (6.0, 0.5)))
    return b.build(pad_to=24)


def make_cfg():
    cfg = art.smoll_room_config(ray_count=512)
    return dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, reverb_duration=0.15,
                                       chunk_duration=0.05,
                                       sample_rate=8000),
        sim=dataclasses.replace(cfg.sim, ray_count=512, max_bounces=4))


def test_dynamic_scene_streaming_differs_from_static():
    cfg = make_cfg()
    scene0 = room_with_rotating_wall(0.0)
    src = np.array([-10.0, 0.0], np.float32)
    lis = np.array([10.0, 0.0], np.float32)
    eng = art.Engine(scene0, cfg)
    p = eng.params(src, lis)
    dry = jnp.asarray(noise_burst(0.15, cfg.audio.sample_rate, seed=4))

    s1 = Streamer(scene0, cfg, jax.random.PRNGKey(0))
    wet_dyn = np.asarray(s1.stream_clip(
        dry, lambda i: p, scene_fn=lambda i: room_with_rotating_wall(
            i * 0.4)))
    s2 = Streamer(scene0, cfg, jax.random.PRNGKey(0))
    wet_static = np.asarray(s2.stream_clip(dry, lambda i: p))
    assert wet_dyn.shape == wet_static.shape
    assert np.all(np.isfinite(wet_dyn))
    assert not np.allclose(wet_dyn, wet_static)
    # chunk 0 has identical geometry (angle 0) and identical keys ->
    # first chunk output must agree exactly
    n = cfg.audio.chunk_samples
    np.testing.assert_allclose(wet_dyn[:, :n], wet_static[:, :n])


def test_stereo_streaming_two_channels():
    cfg = make_cfg()
    scene = room_with_rotating_wall(0.3)
    src = np.array([-10.0, 0.0], np.float32)
    ears = np.stack([[9.7, 0.0], [10.3, 0.0]]).astype(np.float32)
    eng = art.Engine(scene, cfg, n_listeners=2)
    p = eng.params(src, ears)
    dry = jnp.asarray(noise_burst(0.1, cfg.audio.sample_rate, seed=5))
    s = Streamer(scene, cfg, jax.random.PRNGKey(0), n_listeners=2)
    wet = np.asarray(s.stream_clip(dry, lambda i: p))
    assert wet.shape[0] == 2
    assert np.abs(wet).sum() > 0
    assert not np.allclose(wet[0], wet[1])


def test_cli_stereo_bake(tmp_path):
    from realisticaudioraytracing2d_tpu.cli import main
    from realisticaudioraytracing2d_tpu.utils.audio_io import (read_wav,
                                                               write_wav)
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.1, 8000, seed=6), 8000)
    out = str(tmp_path / "wet.wav")
    main(["bake", "--room", "smoll", "--rays", "256", "--bounces", "4",
          "--frames", "1", "--reverb", "0.2", "--sample-rate", "8000",
          "--stereo", "0.4", "--in", dry, "--out", out])
    y, rate = read_wav(out)
    assert y.ndim == 2 and y.shape[1] == 2
    assert not np.allclose(y[:, 0], y[:, 1])
