"""Differentiable-acoustics paths on the real chip.

The inverse suite (diff.py) differentiates the jnp oracle — no Pallas
VJP — so on TPU it runs as XLA-compiled VPU/MXU code. These tests assert
the two headline inverse problems actually work on hardware: a material
fit whose loss drops, and a source localization that lands, plus a
step-time record (stderr) for docs/DIFF.md.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from realisticaudioraytracing2d_tpu import diff
from realisticaudioraytracing2d_tpu.models.materials import AudioMaterial
from realisticaudioraytracing2d_tpu.models.rooms import shoebox_room
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams

SR, IR_LEN, BOUNCES = 8000, 512, 4


def _setup(absorption=0.3):
    scene = shoebox_room(4.0, 4.0,
                         wall_material=AudioMaterial(absorption=absorption,
                                                     scattering=0.4))
    params = TraceParams.make(source=(-1.0, 0.4), listeners=(1.0, 0.3),
                              listener_radius=0.5)
    return scene, params


def test_fit_absorption_descends_on_chip():
    true_scene, params = _setup(absorption=0.45)
    target = diff.simulate_ir(true_scene, params, jax.random.PRNGKey(7),
                              n_rays=256, max_bounces=BOUNCES,
                              sample_rate=SR, ir_length=IR_LEN, frames=2)
    start_scene, _ = _setup(absorption=0.12)
    t0 = time.time()
    result = diff.fit_materials(
        start_scene, params, target, jax.random.PRNGKey(0),
        n_rays=256, max_bounces=BOUNCES, sample_rate=SR,
        fields=("absorption",), loss="edc", steps=40, lr=0.1)
    dt = time.time() - t0
    losses = np.asarray(result.losses)
    print(f"\n[tpu] fit 40 steps in {dt:.1f}s "
          f"({dt / 40 * 1e3:.0f} ms/step incl. compile)", file=sys.stderr)
    assert losses[-5:].mean() < 0.7 * losses[:5].mean(), losses
    groups, _ = diff.infer_material_groups(start_scene)
    fitted = np.asarray(jax.nn.sigmoid(result.params.absorption))
    assert abs(float(fitted[int(groups[0]), 0]) - 0.45) < 0.15, fitted


def test_localize_source_on_chip():
    scene, params = _setup()
    target = diff.simulate_ir(scene, params, jax.random.PRNGKey(0),
                              n_rays=256, max_bounces=BOUNCES,
                              sample_rate=SR, ir_length=IR_LEN, soft=True)
    t0 = time.time()
    result = diff.localize_source(
        scene, params, target, jax.random.PRNGKey(0),
        n_rays=256, max_bounces=BOUNCES, sample_rate=SR,
        n_starts=6, steps=150)
    err = float(jnp.linalg.norm(result.position - params.source))
    print(f"\n[tpu] localize 6x150 in {time.time() - t0:.1f}s, "
          f"err {err * 1e3:.1f} mm", file=sys.stderr)
    assert err < 0.15, (np.asarray(result.position), err,
                        np.asarray(result.losses))
