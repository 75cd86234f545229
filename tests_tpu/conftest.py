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


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="requires a real TPU backend")
    for item in items:
        item.add_marker(skip)
