"""Shared helpers for the Pallas kernels."""

from __future__ import annotations

import jax

LANE = 128
SUB = 8  # sublane multiple


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU test suite)."""
    return jax.default_backend() != "tpu"
