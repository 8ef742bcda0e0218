"""Checkpoint/resume for long solves.

The reference has no checkpointing (SURVEY.md section 5); its failure story
is the wall-clock limit. Here the whole solver state is one pytree, so a
snapshot is a flat npz of its leaves plus a small metadata record. The
device driver snapshots at chunk boundaries (~600 iterations); a resumed
run continues the same level mid-flight with the identical decision state
(sigma cadence counters, rescale stage, history).
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    """Atomic snapshot: leaves in flatten order + json metadata."""
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_pytree(path: str, template: Any):
    """Restore a snapshot into the structure of ``template``. Returns
    (tree, meta). Raises ValueError on shape/count mismatch (stale
    checkpoint from a different level/config)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode() or "{}")
        leaves, treedef = jax.tree.flatten(template)
        n = len(leaves)
        stored = [data[f"leaf_{i}"] for i in range(n)]
        if f"leaf_{n}" in data.files:
            raise ValueError("checkpoint has more leaves than template")
    for i, (s, t) in enumerate(zip(stored, leaves)):
        if tuple(s.shape) != tuple(np.shape(t)):
            raise ValueError(
                f"leaf {i}: checkpoint shape {s.shape} != template {np.shape(t)}"
            )
    new_leaves = [
        jax.numpy.asarray(s, dtype=np.asarray(t).dtype)
        for s, t in zip(stored, leaves)
    ]
    return jax.tree.unflatten(treedef, new_leaves), meta
