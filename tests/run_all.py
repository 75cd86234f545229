#!/usr/bin/env python
"""The CPU test gate: run the full suite in process-isolated batches.

Why this exists: one pytest process running the whole ``tests/`` suite
accumulates hundreds of distinct XLA-CPU compilations and eventually
segfaults inside XLA's ``backend_compile_and_load`` (upstream JAX/XLA
CPU bug on this box — see docs/TESTGATE.md for the standalone repro;
everything passes until the crash, and every file passes in isolation).
The gate therefore runs the suite as per-file batches, each in a fresh
interpreter, and aggregates to ONE green/red exit code:

    python tests/run_all.py            # the gate: rc 0 == green
    python tests/run_all.py -k trace   # pass a -k filter through
    python tests/run_all.py tests/test_trace.py tests/test_ir.py

Each batch stays far below the crash threshold (~200-300 compilations),
so a batch failure is a real test failure, not the upstream crash.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Counts parsed from pytest's final summary line, e.g.
# "= 12 passed, 1 skipped, 2 deselected in 3.45s ="
_SUMMARY_RE = re.compile(
    r"(\d+) (passed|failed|error|errors|skipped|deselected|xfailed|xpassed|warnings?)"
)


def discover(paths: list[str]) -> list[str]:
    if paths:
        return paths
    test_dir = os.path.join(REPO, "tests")
    return sorted(
        os.path.join("tests", f)
        for f in os.listdir(test_dir)
        if f.startswith("test_") and f.endswith(".py")
    )


def run_batch(files: list[str], extra: list[str]) -> tuple[int, dict, str]:
    """Run one pytest subprocess; return (rc, counts, tail-of-output)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # conftest re-pins via jax.config anyway
    cmd = [sys.executable, "-m", "pytest", *files, "-q", "--color=no",
           "-p", "no:cacheprovider", *extra]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    counts: dict = {}
    for n, kind in _SUMMARY_RE.findall(proc.stdout):
        kind = {"errors": "error", "warning": "warnings"}.get(kind, kind)
        counts[kind] = counts.get(kind, 0) + int(n)
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    return proc.returncode, counts, tail


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("files", nargs="*", help="explicit test files (default: all tests/test_*.py)")
    ap.add_argument("-k", dest="keyword", default=None, help="pytest -k filter")
    ap.add_argument("--batch-size", type=int, default=3,
                    help="test files per subprocess (default 3; each stays far "
                         "below the ~200-300-compile XLA-CPU crash threshold)")
    ap.add_argument("-x", "--exitfirst", action="store_true",
                    help="stop at the first failing batch")
    args = ap.parse_args(argv)

    files = discover(args.files)
    extra = ["-k", args.keyword] if args.keyword else []
    batches = [files[i : i + args.batch_size] for i in range(0, len(files), args.batch_size)]

    t0 = time.time()
    totals: dict = {}
    failed_batches: list[list[str]] = []
    for i, batch in enumerate(batches):
        bt0 = time.time()
        rc, counts, tail = run_batch(batch, extra)
        for k, v in counts.items():
            if k != "warnings":
                totals[k] = totals.get(k, 0) + v
        names = ", ".join(os.path.basename(f) for f in batch)
        summary = ", ".join(f"{v} {k}" for k, v in sorted(counts.items()) if k != "warnings")
        status = "ok " if rc == 0 else f"RC={rc}"
        print(f"[{i + 1:2d}/{len(batches)}] {status} {time.time() - bt0:6.1f}s  "
              f"{names}: {summary or 'no tests matched'}", flush=True)
        # rc 5 = "no tests collected" — fine under a -k filter, a bug otherwise
        if rc == 5 and args.keyword:
            rc = 0
        if rc != 0:
            failed_batches.append(batch)
            print(tail, flush=True)
            if args.exitfirst:
                break

    grand = ", ".join(f"{v} {k}" for k, v in sorted(totals.items()))
    elapsed = time.time() - t0
    if failed_batches:
        print(f"\nGATE RED: {len(failed_batches)} failing batch(es) — {grand} "
              f"in {elapsed:.0f}s")
        for b in failed_batches:
            print("  rerun: python -m pytest " + " ".join(b) + " -q")
        return 1
    print(f"\nGATE GREEN: {grand} in {elapsed:.0f}s "
          f"({len(batches)} isolated batches)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
