"""Quad-microphone array demo: one trace pass, four listeners.

Traces the SmollRoom once with a 2x2 microphone array around the shipped
listener position (all four ears share every wall sweep inside the fused
kernel — the marginal cost per extra listener is one NEE/capture pass,
not a retrace), then bakes a 4-channel WAV whose inter-channel delays
encode the array geometry.

Run:  python examples/quad_mic.py  [--tpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--tpu", action="store_true",
                    help="use the default (TPU) backend")
parser.add_argument("--out", default="quad_out")
args = parser.parse_args()

import jax  # noqa: E402

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import realisticaudioraytracing2d_tpu as art  # noqa: E402
from realisticaudioraytracing2d_tpu.utils import audio_io  # noqa: E402

os.makedirs(args.out, exist_ok=True)
key = jax.random.PRNGKey(0)

room = art.rooms.smoll_room()
cfg = art.smoll_room_config(ray_count=4096)

# 2x2 array, 1 m spacing, centered on the shipped listener
center = np.asarray(room.listener, np.float32)
offsets = np.asarray([[-0.5, -0.5], [0.5, -0.5],
                      [-0.5, 0.5], [0.5, 0.5]], np.float32)
mics = center[None, :] + offsets

eng = art.Engine(room.scene, cfg, n_listeners=4)
params = eng.params(room.source, mics)

t0 = time.perf_counter()
state = eng.trace_frames(params, key, n_frames=8)
float(state.sum.sum())
print(f"traced 4-mic array, 8 frames x 4096 rays in "
      f"{time.perf_counter() - t0:.2f}s (incl. compile)")

ir = np.asarray(state.normalized())          # [4, T, 1]
first = [int(np.nonzero(ir[m, :, 0])[0][0]) for m in range(4)]
sr = cfg.audio.sample_rate
print("first arrival per mic (ms):",
      [round(b / sr * 1e3, 2) for b in first])
# mics closer to the source (upper-left) must hear the wavefront first
d = np.linalg.norm(mics - np.asarray(room.source)[None, :], axis=1)
order_geo = np.argsort(d)
order_ir = np.argsort(first)
assert list(order_geo) == list(order_ir), (order_geo, order_ir)

dry = audio_io.click_clip(1.0, sr, click_times=(0.1, 0.5))
wet = np.asarray(eng.bake(jax.numpy.asarray(dry), state))   # [4, N+T]
path = os.path.join(args.out, "quad.wav")
audio_io.write_wav(path, wet.T, sr)
print(f"wrote 4-channel {path} ({wet.shape[1]} samples)")
