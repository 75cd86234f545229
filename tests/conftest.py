"""Test harness configuration.

Runs the whole suite on the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without hardware — the strategy
SURVEY.md section 4 prescribes (the reference has no tests at all; this
suite is this framework's own).

Note: this image's sitecustomize imports jax at interpreter startup and
the env pins JAX_PLATFORMS to the remote-TPU plugin, so env vars are too
late here — the overrides must go through jax.config *before first use*.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
