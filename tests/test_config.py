"""Config dataclass tests: defaults, ranges, JSON round-trip."""

import pytest

from realisticaudioraytracing2d_tpu.config import (AudioConfig, DebugConfig,
                                                   EngineConfig, SimConfig,
                                                   big_room_config,
                                                   smoll_room_config)


def test_defaults_match_reference_inspector():
    # RayTraceManager.cs:13-28 defaults
    sim = SimConfig()
    assert sim.ray_count == 1000
    assert sim.max_bounces == 5
    assert sim.speed_of_sound == 343.0
    assert sim.listener_radius == 0.5
    audio = AudioConfig()
    assert audio.sample_rate == 48000
    assert audio.reverb_duration == 2.0
    assert audio.chunk_duration == 0.1  # AudioManager.cs:5
    assert DebugConfig().debug_ray_count == 100


def test_range_validation():
    with pytest.raises(ValueError):
        SimConfig(ray_count=1)
    with pytest.raises(ValueError):
        SimConfig(n_bands=0)
    with pytest.raises(ValueError):
        AudioConfig(reverb_duration=100.0)


def test_derived_quantities():
    a = AudioConfig(sample_rate=48000, reverb_duration=1.5)
    assert a.ir_length == 72000          # RayTraceManager.cs:181
    assert a.chunk_samples == 4800       # RayTraceManager.cs:129


def test_json_round_trip(tmp_path):
    cfg = smoll_room_config(n_bands=4, ray_count=2048)
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    cfg2 = EngineConfig.load(p)
    assert cfg2 == cfg
    assert cfg2.sim.n_bands == 4
    assert cfg2.audio.reverb_duration == 1.5


def test_shipped_scene_configs():
    small = smoll_room_config()
    big = big_room_config()
    assert small.sim.ray_count == 15000        # SmollRoom.unity:155
    assert small.sim.input_gain == 1.0
    assert big.sim.input_gain == 100.0         # Big Room.unity:161
    assert big.audio.sample_rate == 48000
