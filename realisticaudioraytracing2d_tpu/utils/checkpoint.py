"""Checkpoint / resume for long-running accumulation and dataset sweeps.

The reference persists nothing (IR state is reset, never saved —
``RayTraceManager.cs:169-177``; baked audio lives in a transient AudioClip).
Here IR state, stream state and sweep outputs are plain pytrees, saved as
``.npz`` (plus JSON metadata) so multi-hour Monte-Carlo accumulations and
1024-room sweeps are resumable after preemption — standard JAX practice of
pure state + host-side retry (SURVEY.md section 5).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np

from ..ops.ir import IRState


def _norm(path: str) -> str:
    """np.savez appends .npz when missing; normalize so save/load/sidecar
    always agree on the final filename."""
    return path if path.endswith(".npz") else path + ".npz"


def save_pytree(path: str, tree: Any, meta: Dict | None = None) -> None:
    """Save an arbitrary pytree of arrays as npz + a json treedef."""
    path = _norm(path)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, **arrays)
    side = {"treedef": str(treedef), "n_leaves": len(leaves),
            "meta": meta or {}}
    with open(path + ".json", "w") as f:
        json.dump(side, f)


def load_ir_state(path: str) -> IRState:
    path = _norm(path)
    with np.load(path) as z:
        return IRState(sum=jax.numpy.asarray(z["leaf_0"]),
                       frames=jax.numpy.asarray(z["leaf_1"]))


def save_ir_state(path: str, state: IRState,
                  meta: Dict | None = None) -> None:
    save_pytree(path, state, meta)


def latest_checkpoint(directory: str, prefix: str = "ir_") -> str | None:
    if not os.path.isdir(directory):
        return None
    cands = sorted(f for f in os.listdir(directory)
                   if f.startswith(prefix) and f.endswith(".npz"))
    return os.path.join(directory, cands[-1]) if cands else None
