"""Checkpoint / resume for params + optimizer state pytrees.

Net-new vs the reference (it has none — SURVEY §5 "Checkpoint/resume:
None in-repo"): preemptible TPU slices need save/restore. Uses orbax when
available, with a dependency-free numpy fallback (flattened pytree leaves +
treedef key paths in an .npz).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _flatten(tree) -> tuple[dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}, treedef


def save_checkpoint(ckpt_dir: str, step: int, tree) -> str:
    """Save a pytree under ``ckpt_dir/step_<N>`` (orbax if importable)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step:010d}")
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
    except Exception:
        flat, _ = _flatten(tree)
        np.savez(path + ".npz", **flat)
    with open(os.path.join(ckpt_dir, "latest.json"), "w") as f:
        json.dump({"step": step}, f)
    return path


def latest_step(ckpt_dir: str) -> int | None:
    meta = os.path.join(ckpt_dir, "latest.json")
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        return json.load(f)["step"]


def restore_checkpoint(ckpt_dir: str, target, step: int | None = None):
    """Restore into the structure of ``target`` (returns a new pytree)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"step_{step:010d}")
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path), item=target)
    data = np.load(path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(target)
    new_leaves = []
    for i, old in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        new_leaves.append(jax.numpy.asarray(arr) if hasattr(old, "dtype")
                          else arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
