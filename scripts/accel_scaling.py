"""Wall-count scaling measurement for the cluster-early-out accel path
(docs/ACCEL.md table; round-3 VERDICT stretch #9: extend to 1M walls or
document the measured ceiling).

Runs the production large-scene path (`trace_frames_ir_accel_sorted`,
per-bounce Morton ray re-sort + two-level super/cluster sweep) against
brute force (`early_out=False`, same kernel with the slab skips disabled)
on procedural cities of increasing size, at the docs/ACCEL.md workload:
131072 rays x 6 bounces x 4 frames.

TPU-only (the fused kernels need a real chip). Usage:

    python scripts/accel_scaling.py --boxes 100002 250002
    python scripts/accel_scaling.py --boxes 250002 --no-brute
"""

import argparse
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--boxes", type=int, nargs="+",
                    default=[25002, 100002, 250002],
                    help="city box counts (walls = 4*boxes + 4)")
parser.add_argument("--rays", type=int, default=131072)
parser.add_argument("--bounces", type=int, default=6)
parser.add_argument("--frames", type=int, default=4)
parser.add_argument("--no-brute", action="store_true",
                    help="skip the brute (early_out=False) column")
parser.add_argument("--cluster", type=int, default=128,
                    help="base cluster size (auto-grown to the code-size "
                         "bound)")
args = parser.parse_args()

import jax  # noqa: E402
import jax.random  # noqa: E402

import realisticaudioraytracing2d_tpu as art  # noqa: E402
from realisticaudioraytracing2d_tpu.models.rooms import city_scene  # noqa: E402
from realisticaudioraytracing2d_tpu.ops.pallas.bounce_kernel import (  # noqa: E402
    trace_frames_ir_accel_sorted)


def sync(x):
    # data readback: block_until_ready can return early through the relay
    return float(x.sum())


for n_boxes in args.boxes:
    t0 = time.time()
    room = city_scene(n_boxes=n_boxes)
    params = art.TraceParams.make(room.source, room.listener,
                                  room.listener_radius, 343.0, 100.0)
    n_walls = int(room.scene.n_walls)
    print(f"[{n_walls} walls] scene built in {time.time() - t0:.1f}s",
          flush=True)
    kw = dict(n_rays=args.rays, max_bounces=args.bounces,
              sample_rate=16000, ir_length=24000, n_frames=args.frames,
              cluster_size=args.cluster)

    def timed(**extra):
        ir = trace_frames_ir_accel_sorted(room.scene, params,
                                          jax.random.PRNGKey(0), **kw,
                                          **extra)
        sync(ir)
        t0 = time.perf_counter()
        ir = trace_frames_ir_accel_sorted(room.scene, params,
                                          jax.random.PRNGKey(1), **kw,
                                          **extra)
        sync(ir)
        return time.perf_counter() - t0

    try:
        t_accel = timed(early_out=True)
    except Exception as e:  # noqa: BLE001 — report the ceiling, keep going
        print(f"[{n_walls} walls] accel FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        continue
    tests = args.rays * args.bounces * 2 * n_walls * args.frames
    line = (f"[{n_walls} walls] accel {t_accel * 1e3:7.0f} ms/"
            f"{args.frames} frames  "
            f"{tests / t_accel / 1e9:6.0f} G tests/s brute-equiv")
    print(line, flush=True)
    if not args.no_brute:
        try:
            t_brute = timed(early_out=False)
        except Exception as e:  # noqa: BLE001
            print(f"[{n_walls} walls] brute FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"[{n_walls} walls] brute {t_brute * 1e3:7.0f} ms  "
              f"speedup {t_brute / t_accel:5.2f}x", flush=True)

print("done", file=sys.stderr)
