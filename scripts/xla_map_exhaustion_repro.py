#!/usr/bin/env python
"""Standalone repro for the XLA-CPU unchecked-mmap segfault
(docs/TESTGATE.md): retained JIT executables exhaust the kernel's
per-process mapping cap (``/proc/sys/vm/max_map_count``, default 65530)
and the next LLVM-ORC ``mmap`` failure is dereferenced instead of
reported — the process dies with SIGSEGV inside jax's
``backend_compile_and_load``.

Run directly (defaults demonstrate the mechanism safely, WITHOUT
crashing the host process):

    python scripts/xla_map_exhaustion_repro.py

prints a table of ``/proc/self/maps`` line counts while it (a) compiles
and RETAINS distinct jitted functions (maps grow ~30/executable,
unbounded), (b) calls ``jax.clear_caches()`` (maps collapse back to
baseline), and (c) compiles the same number of UNRETAINED functions
(maps stay flat) — proving retention, not a per-compile leak, is the
growth mechanism, and that ``clear_caches`` is a complete mitigation
(the fix ``tests/conftest.py`` applies at every module teardown).

    python scripts/xla_map_exhaustion_repro.py --crash

actually drives the process over the cap (compiles and retains distinct
functions until segfault or ``--max-fns``). Expect rc=-11 after a few
minutes once ``maps`` crosses ``vm.max_map_count``. Run it in a
disposable subprocess; that is the upstream report's repro.

Upstream report text (filing is not possible from this machine — zero
egress; the verbatim text below is ready to paste):

    Title: XLA:CPU segfaults instead of erroring when mmap fails
      (vm.max_map_count exhaustion with many retained executables)

    Each XLA-CPU compilation JIT-links its executable with LLVM ORC,
    mmapping ~30 code/data regions per executable, which stay mapped
    for the executable's lifetime. A process that compiles and retains
    a few thousand distinct programs (e.g. one pytest process running a
    large jax test suite) crosses the default per-process mapping cap
    (/proc/sys/vm/max_map_count = 65530); the next mmap returns
    MAP_FAILED, the ORC memory mapper does not check it, and the
    process segfaults inside backend_compile_and_load. Expected: a
    clean RuntimeError from the failed compile. Repro: jit-and-retain
    ~2000 distinct small CPU functions (script attached); watch
    wc -l /proc/self/maps cross the cap; observe SIGSEGV. jax 0.9.0,
    Linux 6.x, default vm.max_map_count.
"""

from __future__ import annotations

import argparse
import sys


def maps_count() -> int:
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)


def distinct_fn(i: int, jnp):
    # a distinct jaxpr per i (different constant => different program)
    def f(x):
        return (x * float(i + 1) + float(i)).sum()
    return f


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--crash", action="store_true",
                    help="actually drive the process over "
                         "vm.max_map_count (expect SIGSEGV); run in a "
                         "disposable subprocess")
    ap.add_argument("--retained", type=int, default=60,
                    help="safe mode: distinct retained compiles")
    ap.add_argument("--max-fns", type=int, default=4000,
                    help="crash mode: upper bound on retained compiles")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    x = jnp.arange(64.0)
    base = maps_count()
    print(f"baseline maps={base}")

    if args.crash:
        cap = None
        try:
            with open("/proc/sys/vm/max_map_count") as f:
                cap = int(f.read())
        except OSError:
            pass
        print(f"vm.max_map_count={cap}; compiling+retaining distinct "
              f"functions until segfault (or {args.max_fns}) ...")
        retained = []
        for i in range(args.max_fns):
            g = jax.jit(distinct_fn(i, jnp))
            g(x).block_until_ready()
            retained.append(g)          # <- retention is the bug trigger
            if i % 100 == 0:
                print(f"  {i:5d} compiles  maps={maps_count()}",
                      flush=True)
        print("survived — raise --max-fns or check vm.max_map_count")
        return 1

    # (a) retained growth
    retained = []
    for i in range(args.retained):
        g = jax.jit(distinct_fn(i, jnp))
        g(x).block_until_ready()
        retained.append(g)
    grown = maps_count()
    per = (grown - base) / max(1, args.retained)
    print(f"after {args.retained} RETAINED compiles: maps={grown} "
          f"(~{per:.1f}/executable -> the default suite would cross "
          f"65530 at ~{int((65530 - base) / max(per, 1e-9))} compiles)")

    # (b) clear_caches collapses it (the tests/conftest.py fix)
    retained.clear()
    import jax as _j
    _j.clear_caches()
    cleared = maps_count()
    print(f"after jax.clear_caches(): maps={cleared}")

    # (c) unretained compiles stay flat (not a per-compile leak)
    for i in range(args.retained):
        g = jax.jit(distinct_fn(10_000 + i, jnp))
        g(x).block_until_ready()
        del g
    flat = maps_count()
    print(f"after {args.retained} UNRETAINED compiles: maps={flat}")

    ok = (grown > base + 10 * max(1, args.retained // 2)
          and cleared < base + (grown - base) // 4
          and flat < grown)
    print("mechanism " + ("CONFIRMED" if ok else "NOT confirmed"))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
