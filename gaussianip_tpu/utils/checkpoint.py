"""Checkpoint / resume for train states.

Covers the reference's three mechanisms (SURVEY.md §5):
  1. full train-state checkpoints (params + Adam moments + densify stats +
     step — the reference's GaussianModel.capture/restore + PL
     ModelCheckpoint, gaussian_model.py:50-82) via orbax;
  2. the .ply inter-stage checkpoint (model/ply.py, bitwise-compatible);
  3. stage handoff tensors + the run manifest (utils/saving.RunDirs).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _mask_empty(tree):
    """orbax cannot serialize zero-size arrays (e.g. f_rest at sh_degree 0):
    swap them for None on save and restore them from the template."""
    return jax.tree_util.tree_map(
        lambda a: None if getattr(a, "size", 1) == 0 else a, tree)


def save_train_state(path: str, ts) -> str:
    """Orbax checkpoint of a TrainState (async-safe, atomic)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, _mask_empty(jax.device_get(ts)), force=True)
    ckpt.wait_until_finished()
    return path


def load_train_state(path: str, like):
    """Restore into the structure of `like` (a template TrainState with the
    right shapes/dtypes — capacity must match)."""
    import orbax.checkpoint as ocp

    like_host = jax.device_get(like)
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path), target=_mask_empty(like_host))
    # put the zero-size arrays back from the template
    leaves_l, treedef = jax.tree_util.tree_flatten(like_host)
    out = []
    ri = jax.tree_util.tree_leaves(restored)
    k = 0
    for l in leaves_l:
        if getattr(l, "size", 1) == 0:
            out.append(l)
        else:
            out.append(ri[k])
            k += 1
    return jax.tree_util.tree_unflatten(treedef, out)


def save_train_state_npz(path: str, ts) -> str:
    """Dependency-light fallback: flatten the pytree into one .npz."""
    leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(ts))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, n=len(leaves),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    return path


def load_train_state_npz(path: str, like):
    leaves, treedef = jax.tree_util.tree_flatten(like)
    data = np.load(path)
    assert int(data["n"]) == len(leaves), "structure mismatch"
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in new_leaves])
