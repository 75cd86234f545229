"""Test harness configuration.

Runs the whole suite on the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without hardware — the strategy
SURVEY.md section 4 prescribes (the reference has no tests at all; this
suite is this framework's own).

Must set env vars before jax is first imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
