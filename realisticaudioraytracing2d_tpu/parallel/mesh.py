"""Device-mesh helpers.

The reference is single-GPU with no communication backend (SURVEY.md
section 2.4); scaling here is first-class: ``jax.sharding.Mesh`` +
``NamedSharding`` is the communication layer, XLA collectives ride ICI.

Canonical axes (any mesh axis name works; these are the conventions):
* ``"rooms"`` — data-parallel over scenes (dataset sweeps, config #5) or
  over Monte-Carlo frames (``parallel/frames.py``);
* ``"rays"``  — model-parallel over the ray batch of one scene
  (``parallel/rays.py``) or sequence-parallel over audio time
  (``parallel/seq.py``); partial IRs / partial convolutions are
  ``psum``-reduced (both ops are linear, so sharding and summing is
  exact).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("rooms", "rays"),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the ``rooms`` axis, ``rays`` axis size 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_leading(mesh: Mesh, axis: str) -> NamedSharding:
    return NamedSharding(mesh, P(axis))
