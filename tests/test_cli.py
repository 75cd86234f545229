"""CLI smoke tests: every subcommand end-to-end on tiny workloads."""

import json
import os

import numpy as np
import pytest

from realisticaudioraytracing2d_tpu.cli import main
from realisticaudioraytracing2d_tpu.utils.audio_io import (noise_burst,
                                                           read_wav,
                                                           write_wav)

# SmollRoom needs >= 3 bounces before any energy reaches the listener:
# the source sits behind the transmissive slant wall, so rays spend
# bounces 0-1 entering/exiting it (wallDepth gating) before capture/NEE
# can fire — same as the reference's depth-gated kernel.
TINY = ["--rays", "256", "--bounces", "4", "--frames", "1",
        "--reverb", "0.2", "--sample-rate", "8000"]


def test_cli_trace(tmp_path, capsys):
    out = str(tmp_path / "ir.png")
    scene_out = str(tmp_path / "scene.png")
    ir_out = str(tmp_path / "ir.npz")
    main(["trace", "--room", "smoll", *TINY, "--out", out,
          "--scene-out", scene_out, "--ir-out", ir_out,
          "--debug-rays", "4"])
    assert os.path.exists(out) and os.path.exists(scene_out)
    assert os.path.exists(ir_out)
    assert "traced" in capsys.readouterr().out


def test_cli_bake_and_stream(tmp_path, capsys):
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.12, 8000, seed=3), 8000)

    wet = str(tmp_path / "wet.wav")
    main(["bake", "--room", "smoll", *TINY, "--in", dry, "--out", wet])
    y, rate = read_wav(wet)
    assert rate == 8000 and len(y) > 0.12 * 8000
    assert np.abs(y).max() > 0.5  # peak-normalized

    wet2 = str(tmp_path / "wet2.wav")
    main(["stream", "--room", "smoll", *TINY, "--in", dry, "--out", wet2,
          "--move-listener", "0.5,0.0"])
    y2, _ = read_wav(wet2)
    assert np.abs(y2).max() > 0
    assert "realtime" in capsys.readouterr().out


def test_cli_sweep(tmp_path):
    out = str(tmp_path / "ds.npz")
    main(["sweep", "--rooms", "2", *TINY, "--out", out])
    with np.load(out) as z:
        assert z["irs"].shape[0] == 2
        assert z["sources"].shape == (2, 2)


def test_cli_scene_json(tmp_path):
    spec = {
        "source": [0.0, 0.0],
        "listener": [5.0, 0.0],
        "listener_radius": 0.5,
        "boxes": [
            {"position": [8.0, 0.0], "scale": [1.0, 20.0],
             "material": {"absorption": 0.2, "scattering": 0.1,
                          "transmission": 0.0, "ior": 1.0}},
        ],
    }
    sj = str(tmp_path / "scene.json")
    with open(sj, "w") as f:
        json.dump(spec, f)
    out = str(tmp_path / "ir.png")
    main(["trace", "--scene-json", sj, *TINY, "--out", out])
    assert os.path.exists(out)


def test_cli_spectro_out(tmp_path):
    out = str(tmp_path / "spec.png")
    main(["trace", "--room", "smoll", *TINY, "--spectro-out", out])
    assert os.path.exists(out)

    out2 = str(tmp_path / "spec4.png")
    main(["trace", "--room", "smoll", *TINY, "--bands", "4",
          "--spectro-out", out2])
    assert os.path.exists(out2)


def test_cli_legacy_bake(tmp_path):
    from realisticaudioraytracing2d_tpu.utils.audio_io import noise_burst
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.1, 8000, seed=9), 8000)
    out = str(tmp_path / "wet_legacy.wav")
    main(["bake", "--room", "smoll", *TINY, "--legacy",
          "--in", dry, "--out", out])
    y, rate = read_wav(out)
    assert np.abs(y).max() > 0.5


def test_cli_resume_from_checkpoint(tmp_path):
    ir1 = str(tmp_path / "ir1.npz")
    main(["trace", "--room", "smoll", *TINY, "--ir-out", ir1])
    ir2 = str(tmp_path / "ir2.npz")
    main(["trace", "--room", "smoll", *TINY, "--ir-in", ir1,
          "--ir-out", ir2])
    from realisticaudioraytracing2d_tpu.utils.checkpoint import load_ir_state
    st1 = load_ir_state(ir1)
    st2 = load_ir_state(ir2)
    assert int(st2.frames) == int(st1.frames) + 1  # TINY uses --frames 1
    assert float(st2.sum.sum()) > float(st1.sum.sum())


def test_cli_bake_uses_builtin_clip_by_default(tmp_path):
    # Out-of-box story (round-1 VERDICT missing #3): bake with no --in
    # falls back to the bundled WAV fixture.
    out = str(tmp_path / "wet.wav")
    main(["bake", "--room", "smoll", "--out", out,
          "--rays", "512", "--bounces", "4", "--frames", "1",
          "--reverb", "0.2"])
    from realisticaudioraytracing2d_tpu.utils.audio_io import read_wav
    x, sr = read_wav(out)
    assert sr == 48000 and np.abs(np.asarray(x)).max() > 0


def test_builtin_clip_exists_and_reads():
    from realisticaudioraytracing2d_tpu.utils.audio_io import (
        builtin_clip_path, load_builtin_clip)
    import os
    assert os.path.exists(builtin_clip_path())
    x, sr = load_builtin_clip()
    assert sr == 48000 and x.shape[0] == 48000
    assert np.abs(x).max() > 0.9  # the delay-readable clicks


def test_cli_live(tmp_path, capsys):
    out = str(tmp_path / "live.wav")
    main(["live", "--room", "smoll", *TINY, "--out", out,
          "--duration", "0.3", "--dsp-buffer", "256"])
    txt = capsys.readouterr().out
    assert "underruns" in txt and os.path.exists(out)
    x, rate = read_wav(out)
    assert rate == 8000 and len(x) == 3 * 800  # 3 chunks of 0.1 s @ 8 kHz


def test_cli_stream_viz_every(tmp_path):
    # periodic DrawIR-equivalent rasters during streaming
    # (RayTraceManager.cs:252-258): cadence = every N chunks, content =
    # a non-blank waveform image once the IR has energy
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.12, 8000, seed=3), 8000)
    wet = str(tmp_path / "wet.wav")
    main(["stream", "--room", "smoll", *TINY, "--in", dry, "--out", wet,
          "--duration", "0.4", "--viz-every", "2"])
    pngs = sorted(p.name for p in tmp_path.glob("wet_ir_*.png"))
    assert pngs == ["wet_ir_0000.png", "wet_ir_0002.png"]  # 4 chunks, N=2
    # content: a drawn waveform deflate-compresses measurably larger than
    # the same-size blank raster (image decode is tested in test_utils)
    blank = tmp_path / "blank.png"
    from realisticaudioraytracing2d_tpu.utils import viz
    viz.save_image(str(blank), viz.ir_waveform_image(
        np.zeros((800, 1), np.float32), 1))
    assert (tmp_path / "wet_ir_0002.png").stat().st_size > \
        blank.stat().st_size


def test_cli_live_viz_every(tmp_path):
    out = str(tmp_path / "live.wav")
    main(["live", "--room", "smoll", *TINY, "--out", out,
          "--duration", "0.3", "--dsp-buffer", "256", "--viz-every", "3"])
    assert (tmp_path / "live_ir_0000.png").exists()
    assert not (tmp_path / "live_ir_0001.png").exists()


def test_cli_bake_mp3_in_mp3_out(tmp_path):
    # the reference's clips are mp3 (Assets/Script/bruh.mp3 etc.); the
    # whole pipeline must take and produce mp3 via the system codecs
    from realisticaudioraytracing2d_tpu import native
    if not all(native.mp3_probe()):
        pytest.skip("system mp3 codecs not available")
    from realisticaudioraytracing2d_tpu.utils.audio_io import read_audio
    dry = str(tmp_path / "dry.mp3")
    native.encode_mp3(dry, noise_burst(0.3, 44100, seed=5), 44100)
    wet = str(tmp_path / "wet.mp3")
    main(["bake", "--room", "smoll", *TINY, "--in", dry, "--out", wet])
    y, rate = read_audio(wet)
    assert rate == 8000 and len(y) > 0.3 * 8000
    assert np.isfinite(y).all() and np.abs(y).max() > 0.3


def test_cli_fit(tmp_path, capsys):
    ir = str(tmp_path / "ir.npz")
    main(["trace", "--room", "smoll", *TINY, "--ir-out", ir])
    out = str(tmp_path / "materials.json")
    main(["fit", "--room", "smoll", *TINY, "--target", ir, "--out", out,
          "--steps", "3", "--fit-rays", "64"])
    report = json.load(open(out))
    assert report["groups"], report
    g = report["groups"][0]
    assert 0.0 <= g["absorption"][0] <= 1.0
    assert g["n_walls"] > 0
    assert "fit" in capsys.readouterr().out


def test_cli_locate(tmp_path, capsys):
    ir = str(tmp_path / "ir.npz")
    main(["trace", "--room", "smoll", *TINY, "--ir-out", ir])
    out = str(tmp_path / "located.json")
    main(["locate", "--room", "smoll", *TINY, "--target", ir, "--out", out,
          "--steps", "3", "--starts", "2", "--fit-rays", "64"])
    report = json.load(open(out))
    assert len(report["position"]) == 2
    assert len(report["starts"]) == 2
    assert np.isfinite(report["loss"])
    assert "located source" in capsys.readouterr().out


def test_cli_locate_two_sources(tmp_path, capsys):
    ir = str(tmp_path / "ir.npz")
    main(["trace", "--room", "smoll", *TINY, "--ir-out", ir])
    out = str(tmp_path / "located2.json")
    main(["locate", "--room", "smoll", *TINY, "--target", ir, "--out", out,
          "--steps", "3", "--starts", "2", "--fit-rays", "64",
          "--sources", "2", "--bounds=-20,-4,0,9"])
    report = json.load(open(out))
    assert np.asarray(report["position"]).shape == (2, 2)
    assert np.asarray(report["starts"][0]["position"]).shape == (2, 2)
    assert " + " in capsys.readouterr().out


def test_cli_analyze_traced(tmp_path, capsys):
    out = str(tmp_path / "report.json")
    edc = str(tmp_path / "edc.png")
    main(["analyze", "--room", "smoll", *TINY, "--out", out,
          "--edc-out", edc])
    assert os.path.exists(edc)
    with open(out) as f:
        report = json.load(f)
    b0 = report["listeners"][0]["bands"][0]
    assert 0.0 <= b0["d50"] <= 1.0
    assert b0["direct_time_s"] > 0
    assert "C50" in capsys.readouterr().out


def test_cli_analyze_from_checkpoint(tmp_path, capsys):
    ir_out = str(tmp_path / "ir.npz")
    main(["trace", "--room", "smoll", *TINY, "--ir-out", ir_out])
    capsys.readouterr()
    main(["analyze", *TINY, "--ir-in", ir_out])
    out = capsys.readouterr().out
    report = json.loads(out[:out.rindex("}") + 1])
    assert report["sample_rate"] == 8000
    assert report["listeners"][0]["bands"][0]["total_energy"] > 0


def test_cli_air_absorption(tmp_path, capsys):
    ir_out = str(tmp_path / "ir.npz")
    main(["trace", "--room", "smoll", *TINY, "--bands", "2",
          "--air", "--ir-out", ir_out])
    out = capsys.readouterr().out
    assert "air absorption" in out and "dB/km" in out
    # --ir-out checkpoints the RAW accumulation: analyzing it without
    # --air must show more total energy than with it.
    from realisticaudioraytracing2d_tpu.utils.checkpoint import \
        load_ir_state
    from realisticaudioraytracing2d_tpu.ops import air
    raw = load_ir_state(ir_out)
    alpha = air.iso9613_alpha(air.band_frequencies(2))
    wet = air.apply_air_absorption(raw.sum, 8000, alpha)
    assert float(np.sum(wet)) < float(np.sum(np.asarray(raw.sum)))


def test_cli_sweep_metrics_and_move_source(tmp_path, capsys):
    out = str(tmp_path / "ds.npz")
    m_out = str(tmp_path / "metrics.npz")
    main(["sweep", "--rooms", "4", *TINY, "--out", out,
          "--metrics-out", m_out])
    m = np.load(m_out)
    assert m["rt60_t20_s"].shape == (4, 1, 1)
    assert np.all((m["d50"] >= 0) & (m["d50"] <= 1))
    capsys.readouterr()

    from realisticaudioraytracing2d_tpu.utils.audio_io import (noise_burst,
                                                               write_wav)
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.12, 8000, seed=3), 8000)
    wet_moving = str(tmp_path / "wet_mv.wav")
    main(["stream", "--room", "smoll", *TINY, "--in", dry,
          "--out", wet_moving, "--move-source", "4,0"])
    wet_static = str(tmp_path / "wet_st.wav")
    main(["stream", "--room", "smoll", *TINY, "--in", dry,
          "--out", wet_static])
    from realisticaudioraytracing2d_tpu.utils.audio_io import read_wav
    a, _ = read_wav(wet_moving)
    b, _ = read_wav(wet_static)
    assert a.shape == b.shape and not np.allclose(a, b)


def test_cli_trace_diffraction_fills_shadow(tmp_path, capsys):
    # Opaque barrier between source and listener: without diffraction the
    # listener is in a hard shadow (near-zero IR); with it, energy lands.
    # Thin barrier (2-point polygon -> doubled zero-thickness wall):
    # first-order diffraction cannot round a THICK box (that takes
    # edge-to-edge double diffraction, ops/diffraction.py docstring).
    spec = {
        "source": [-3.0, 0.0], "listener": [3.0, 0.0],
        "listener_radius": 0.5,
        "colliders": [{
            "type": "polygon", "paths": [[[0.0, -4.0], [0.0, 4.0]]],
            "material": {"absorption": 0.9, "scattering": 0.5,
                         "transmission": 0.0, "ior": 1.0}}],
    }
    scene_json = str(tmp_path / "barrier.json")
    with open(scene_json, "w") as f:
        json.dump(spec, f)
    base = ["trace", "--scene-json", scene_json, *TINY,
            "--ir-out", str(tmp_path / "ir.npz")]
    main(base)
    capsys.readouterr()
    from realisticaudioraytracing2d_tpu.utils.checkpoint import \
        load_ir_state
    dry = float(np.asarray(load_ir_state(
        str(tmp_path / "ir.npz")).sum).sum())

    main(base + ["--diffraction"])
    out = capsys.readouterr().out
    assert "diffraction" in out
    # --ir-out stays raw; the printed IR energy line reflects the filled
    # shadow. Re-run analyze-style check via the printed energy:
    import re
    m = re.search(r"IR energy ([0-9.eE+-]+)", out)
    assert m and float(m.group(1)) > dry


def test_cli_trace_directivity(tmp_path, capsys):
    ir_a = str(tmp_path / "a.npz")
    ir_b = str(tmp_path / "b.npz")
    main(["trace", "--room", "smoll", *TINY, "--ir-out", ir_a])
    main(["trace", "--room", "smoll", *TINY, "--ir-out", ir_b,
          "--directivity", "cardioid:45"])
    from realisticaudioraytracing2d_tpu.utils.checkpoint import \
        load_ir_state
    a = np.asarray(load_ir_state(ir_a).sum)
    b = np.asarray(load_ir_state(ir_b).sum)
    assert a.shape == b.shape and not np.allclose(a, b)
    with pytest.raises(SystemExit):
        main(["trace", "--room", "smoll", *TINY,
              "--directivity", "nope"])


def test_cli_stereo_xy_pair(tmp_path):
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.12, 8000, seed=3), 8000)
    wet = str(tmp_path / "xy.wav")
    main(["bake", "--room", "smoll", *TINY, "--in", dry, "--out", wet,
          "--stereo", "0.2", "--stereo-aim", "45", "--no-normalize"])
    y, _ = read_wav(wet)
    assert y.ndim == 2 and y.shape[1] == 2
    left, right = np.abs(y[:, 0]).sum(), np.abs(y[:, 1]).sum()
    # the XY pair must decorrelate the ears (different pickup of the
    # same field); exact balance depends on the room
    assert left > 0 and right > 0 and not np.isclose(left, right)
    with pytest.raises(SystemExit):
        main(["bake", "--room", "smoll", *TINY, "--in", dry,
              "--out", wet, "--stereo-aim", "45"])


def test_cli_scene_json_ships_patterns(tmp_path):
    # the exported-scene schema can carry source/mic patterns; the CLI
    # honors them when no flag overrides
    spec = {
        "source": [0.0, 0.0],
        "listeners": [[5.0, 0.1], [5.0, -0.1]],
        "listener_radius": 0.5,
        "directivity": "cardioid:0",
        "mic_directivity": ["cardioid:180", "cardioid:0"],
        "boxes": [
            {"position": [8.0, 0.0], "scale": [1.0, 20.0],
             "material": {"absorption": 0.9, "scattering": 0.1,
                          "transmission": 0.0, "ior": 1.0}}],
    }
    sj = str(tmp_path / "scene.json")
    with open(sj, "w") as f:
        json.dump(spec, f)
    ir_out = str(tmp_path / "ir.npz")
    main(["trace", "--scene-json", sj, *TINY, "--bounces", "2",
          "--ir-out", ir_out])
    from realisticaudioraytracing2d_tpu.utils.checkpoint import \
        load_ir_state
    per_l = np.asarray(load_ir_state(ir_out).sum).sum(axis=(1, 2))
    # mic 0 faces the source (direct + echo); mic 1 faces away — its
    # direct path is nulled but it still hears the wall echo from +x,
    # so the level gap is large yet finite
    assert per_l[1] > 0
    assert per_l[0] > 10 * per_l[1]


def test_cli_trace_spatial_out(tmp_path, capsys):
    out = str(tmp_path / "spatial.npz")
    main(["trace", "--room", "smoll", *TINY, "--spatial-out", out])
    assert os.path.exists(out)
    z = np.load(out)
    assert z["w"].shape == z["x"].shape == z["arrival_angle"].shape
    assert int(z["sample_rate"]) == 8000
    cap = capsys.readouterr().out
    assert "arrival 0:" in cap and "deg" in cap


def test_cli_binaural_bake(tmp_path):
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.12, 8000, seed=3), 8000)
    wet = str(tmp_path / "bin.wav")
    main(["bake", "--room", "smoll", *TINY, "--in", dry, "--out", wet,
          "--binaural", "90", "--no-normalize"])
    y, rate = read_wav(wet)
    assert rate == 8000
    assert y.ndim == 2 and y.shape[1] == 2
    left, right = np.abs(y[:, 0]).sum(), np.abs(y[:, 1]).sum()
    # the decode lateralizes: the ears must differ, and both hear
    assert left > 0 and right > 0 and not np.isclose(left, right)
    # binaural owns the ear patterns: combinations raise
    with pytest.raises(SystemExit):
        main(["bake", "--room", "smoll", *TINY, "--in", dry, "--out", wet,
              "--binaural", "0", "--stereo", "0.2"])
    with pytest.raises(SystemExit):
        main(["bake", "--room", "smoll", *TINY, "--in", dry, "--out", wet,
              "--binaural", "0", "--mic-directivity", "cardioid:0"])
    with pytest.raises(SystemExit):
        main(["bake", "--room", "smoll", *TINY, "--in", dry, "--out", wet,
              "--binaural", "0", "--legacy"])


def test_cli_binaural_stream(tmp_path):
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.12, 8000, seed=3), 8000)
    wet = str(tmp_path / "binstream.wav")
    main(["stream", "--room", "smoll", *TINY, "--in", dry, "--out", wet,
          "--binaural", "0", "--head-turn", "90"])
    y, rate = read_wav(wet)
    assert rate == 8000
    assert y.ndim == 2 and y.shape[1] == 2
    assert np.abs(y).max() > 0
    with pytest.raises(SystemExit):
        main(["stream", "--room", "smoll", *TINY, "--in", dry,
              "--out", wet, "--binaural", "0", "--stereo", "0.2"])


def test_cli_doppler_stream(tmp_path):
    dry = str(tmp_path / "dry.wav")
    write_wav(dry, noise_burst(0.12, 8000, seed=3), 8000)
    a = str(tmp_path / "plain.wav")
    b = str(tmp_path / "dopp.wav")
    common = ["stream", "--room", "smoll", *TINY, "--in", dry,
              "--move-source", "10,0"]
    main([*common, "--out", a])
    main([*common, "--out", b, "--doppler"])
    ya, _ = read_wav(a)
    yb, _ = read_wav(b)
    assert np.abs(yb).max() > 0
    # the warped dry feed must change the output
    assert not np.allclose(ya, yb)
