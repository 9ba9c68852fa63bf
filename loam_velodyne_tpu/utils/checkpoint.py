"""Checkpoint / resume of engine state.

The reference has none: killing laserMapping loses the whole cube map
(SURVEY.md §5). Here the entire engine state is one pytree of fixed
arrays, so checkpointing is a flat npz of leaves — restartable
mid-sequence on any host. (orbax is available for multi-host sharded
checkpoints later; npz keeps the single-chip path dependency-free.)
"""

from __future__ import annotations

import io
import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)   # atomic: a crash never leaves a torn checkpoint


def load_pytree(path: str, template: Any) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        if len(data.files) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(data.files)} leaves, template has "
                f"{len(leaves)} — config mismatch?")
        new_leaves = []
        for i, tmpl in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            t = np.asarray(tmpl)
            if arr.shape != t.shape:
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != template "
                    f"shape {t.shape} — config mismatch?")
            new_leaves.append(arr.astype(t.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
