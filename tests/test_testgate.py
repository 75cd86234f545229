"""Self-enforcing guard for the vm.max_map_count fix (docs/TESTGATE.md).

The single-process CPU gate depends on tests/conftest.py's module-
teardown ``jax.clear_caches()``: retained XLA-CPU executables hold ~30
mmap regions each and a full-suite run without the fixture crosses the
kernel's 65530 per-process mapping cap and segfaults inside
``backend_compile_and_load``. These tests make that invariant
self-enforcing — if the fixture (or the underlying clear_caches
behavior) silently regresses, they fail loudly instead of the suite
dying 60% in. The standalone mechanism demo / upstream repro is
``scripts/xla_map_exhaustion_repro.py``.
"""

import subprocess
import sys

import jax
import jax.numpy as jnp


def _maps_count() -> int:
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)


def test_clear_caches_releases_executable_mappings():
    # the mechanism the conftest fixture relies on: retained compiles
    # grow the mapping table; clear_caches collapses it back
    base = _maps_count()
    x = jnp.arange(64.0)
    retained = []
    n = 40
    for i in range(n):
        def f(y, k=float(i)):
            return (y * (k + 1.0) + k).sum()
        g = jax.jit(f)
        g(x).block_until_ready()
        retained.append(g)
    grown = _maps_count()
    assert grown > base + n, (
        f"retained executables no longer hold mappings ({base} -> "
        f"{grown}); TESTGATE.md's model of the crash changed — re-verify")
    retained.clear()
    jax.clear_caches()
    cleared = _maps_count()
    assert cleared - base < (grown - base) / 4, (
        f"jax.clear_caches() no longer releases executable mappings "
        f"({base} -> {grown} -> {cleared}); the conftest module-teardown "
        f"fixture no longer bounds the suite — the single-process gate "
        f"will segfault (docs/TESTGATE.md)")


def test_suite_process_is_far_from_the_mapping_cap():
    # wherever in the suite order this runs, the fixture must be keeping
    # live mappings two orders of magnitude under the 65530 cap
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            cap = int(f.read())
    except OSError:
        cap = 65530
    count = _maps_count()
    assert count < cap * 0.5, (
        f"this pytest process holds {count} mappings (cap {cap}); the "
        f"clear_caches teardown in tests/conftest.py has regressed "
        f"(docs/TESTGATE.md)")


def test_conftest_still_installs_the_teardown():
    import os
    path = os.path.join(os.path.dirname(__file__), "conftest.py")
    with open(path) as f:
        src = f.read()
    assert "clear_caches" in src, (
        "tests/conftest.py lost its module-teardown jax.clear_caches(); "
        "see docs/TESTGATE.md before removing it")


def test_repro_script_demonstrates_the_mechanism():
    # the shipped standalone repro (safe mode) must confirm the
    # mechanism end to end in a fresh interpreter
    proc = subprocess.run(
        [sys.executable, "scripts/xla_map_exhaustion_repro.py",
         "--retained", "30"],
        capture_output=True, text=True, timeout=300,
        cwd=__import__("os").path.dirname(
            __import__("os").path.dirname(__import__("os").path.abspath(
                __file__))))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "mechanism CONFIRMED" in proc.stdout
