"""Checkpoint / resume for SLAM state.

The reference can only *export* a map at shutdown; there is no load path — a
map cannot be resumed (SURVEY.md §5).  Here the whole `SlamState` (map
window statistics, occupancy grid, alignment bookkeeping, pose) is a pytree,
so checkpointing is flat serialization: an ``.npz`` with one named array per
leaf plus a structural descriptor. Orbax is supported as an optional backend
for async / sharded checkpoints.

Format v2 (this module): each leaf is stored under its *pytree key path*
(e.g. ``.map.mean_c``) and the descriptor is the JSON list of those paths.
Validation compares paths + shapes + dtypes — a *structural* contract that
is stable across JAX versions, unlike v1's ``str(treedef)`` repr (whose
format JAX does not guarantee).  v1 checkpoints (``leaf_0000``-indexed) are
still readable: they are validated by leaf count + per-leaf shape/dtype
only.  Pytree evolution (new state fields added by a newer build) is
handled by :func:`restore` with ``allow_partial=True``: leaves present in
the checkpoint load by path, new leaves keep their init values.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np

FORMAT_VERSION = 2


def _leaf_key(i: int) -> str:
    return f"leaf_{i:04d}"


def _leaf_paths(state: Any):
    """(paths [str], leaves) of a pytree, in flatten order."""
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    paths = [jax.tree_util.keystr(kp) for kp, _ in flat]
    return paths, [leaf for _, leaf in flat]


def save(path: str, state: Any) -> None:
    """Save any pytree of arrays to ``path`` (.npz)."""
    paths, leaves = _leaf_paths(state)
    if len(set(paths)) != len(paths):  # cannot key the npz by path
        raise ValueError(f"duplicate pytree key paths: {paths}")
    arrays = {p: np.asarray(l) for p, l in zip(paths, leaves)}
    arrays["__paths__"] = np.frombuffer(
        json.dumps(paths).encode(), dtype=np.uint8
    )
    arrays["__version__"] = np.asarray(FORMAT_VERSION)
    np.savez_compressed(path, **arrays)


def _check_leaf(name: str, arr: np.ndarray, ref: np.ndarray) -> np.ndarray:
    if arr.shape != ref.shape:
        raise ValueError(
            f"checkpoint leaf {name}: shape {arr.shape} != expected "
            f"{ref.shape} — the restoring session's configuration "
            "(frame size, cell side, window slots, ring rows, occupancy "
            "grid on/off, beam count) must match the one that saved the "
            "checkpoint"
        )
    return arr.astype(ref.dtype)


def restore(path: str, like: Any, allow_partial: bool = False) -> Any:
    """Restore a pytree saved by :func:`save` into the structure of ``like``.

    Leaves are matched *by key path* and validated shape/dtype leaf by leaf —
    a checkpoint from a different pytree structure whose leaf shapes happen
    to match must not silently load.  With ``allow_partial=True``, leaves of
    ``like`` that the checkpoint lacks keep their current (init) values —
    the migration path for checkpoints saved by an older build whose state
    had fewer fields; *extra* saved leaves are always an error.
    """
    data = np.load(path)
    paths, leaves = _leaf_paths(like)
    _, treedef = jax.tree_util.tree_flatten(like)

    if "__paths__" in data:  # v2: path-keyed
        saved_paths = json.loads(bytes(data["__paths__"]).decode())
        extra = [p for p in saved_paths if p not in paths]
        missing = [p for p in paths if p not in saved_paths]
        if extra or (missing and not allow_partial):
            raise ValueError(
                "checkpoint pytree structure does not match the restoring "
                f"state:\n  leaves only in checkpoint: {extra}\n"
                f"  leaves only in restoring state: {missing}\n"
                "(pass allow_partial=True to init-fill missing leaves when "
                "restoring an older-format checkpoint)"
            )
        restored = [
            _check_leaf(p, data[p], np.asarray(ref))
            if p in saved_paths else np.asarray(ref)
            for p, ref in zip(paths, leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, restored)

    # v1 fallback: leaf_NNNN-indexed, no stable structural descriptor (its
    # __treedef__ was a str(treedef) repr, not comparable across JAX
    # versions) — validate by leaf count + shape/dtype.  When the file DOES
    # carry a __treedef__, still compare it: a mismatch under a matching
    # leaf count may mean a structurally different pytree (or just a repr
    # format change from a JAX upgrade, which is indistinguishable), so it
    # warns rather than silently loading.
    if "__treedef__" in data:
        saved_td = bytes(data["__treedef__"]).decode()
        if saved_td != str(treedef):
            import warnings

            warnings.warn(
                "v1 checkpoint __treedef__ does not match the restoring "
                f"state's pytree structure:\n  saved: {saved_td}\n"
                f"  restoring: {str(treedef)}\n"
                "(may be a JAX treedef-repr format change; proceeding on "
                "leaf count + shape/dtype validation only)"
            )
    n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_saved != len(leaves):
        raise ValueError(
            f"v1 checkpoint has {n_saved} leaves, restoring state has "
            f"{len(leaves)} — structures differ"
        )
    restored = [
        _check_leaf(_leaf_key(i), data[_leaf_key(i)], np.asarray(ref))
        for i, ref in enumerate(leaves)
    ]
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
