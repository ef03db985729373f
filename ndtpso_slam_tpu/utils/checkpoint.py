"""Checkpoint / resume for SLAM state.

The reference can only *export* a map at shutdown; there is no load path — a
map cannot be resumed (SURVEY.md §5).  Here the whole `SlamState` (map
window statistics, occupancy grid, alignment bookkeeping, pose) is a pytree,
so checkpointing is flat serialization: an ``.npz`` with the flattened leaf
arrays plus the treedef. Orbax is supported as an optional backend for
async / sharded checkpoints.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def _leaf_key(i: int) -> str:
    return f"leaf_{i:04d}"


def save(path: str, state: Any) -> None:
    """Save any pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {_leaf_key(i): np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def restore(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save` into the structure of ``like``
    (treedef validated against the saved one, then shape/dtype leaf by
    leaf — a checkpoint from a *different pytree structure* whose leaf shapes
    happen to match must not silently load)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if "__treedef__" in data:
        saved_treedef = json.loads(bytes(data["__treedef__"]).decode())
        if saved_treedef != str(treedef):
            raise ValueError(
                "checkpoint pytree structure does not match the restoring "
                f"state:\n  saved:    {saved_treedef}\n  expected: {treedef}"
            )
    restored = []
    for i, ref in enumerate(leaves):
        arr = data[_leaf_key(i)]
        ref_arr = np.asarray(ref)
        if arr.shape != ref_arr.shape:
            raise ValueError(
                f"checkpoint leaf {i}: shape {arr.shape} != expected "
                f"{ref_arr.shape} — the restoring session's configuration "
                "(frame size, cell side, window slots, occupancy grid on/off, "
                "beam count) must match the one that saved the checkpoint"
            )
        restored.append(arr.astype(ref_arr.dtype))
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_orbax(path: str, state: Any) -> None:
    """Optional Orbax backend (async-capable, multi-host)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)
