"""TPU-only test harness: runs on the REAL chip (no platform override).

The main suite (tests/) forces an 8-virtual-device CPU backend; these
tests exercise the TPU-only production paths (mega kernel, on-core PRNG)
that interpret mode cannot reach. Run them with:

    cd /root/repo && python -m pytest tests_tpu/ -q

Only one TPU process may run at a time on this image (futex deadlock) —
never run these concurrently with bench.py or the CLI.
"""

import jax
import pytest

# Persistent compilation cache: tests_tpu is dominated by XLA compiles
# (~20-60 s each, one real chip, one CPU core). Caching them on disk cuts
# repeat verify runs from ~15 min to ~2 min. Must be set before the first
# compilation, which is why it lives here and not in a fixture.
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="requires a real TPU backend")
    for item in items:
        item.add_marker(skip)
