"""Checkpoint save/restore for full train states.

The reference saves per-module ``state_dict`` tars every 2 epochs and cannot
resume optimizer state or the epoch counter — restart only (SURVEY §5;
reference utils.py:9-25, train_and_test.py:364-372,778-781).  Here the FULL
train state pytree (params, all 11 optimizer states, GradNorm weights,
NoiseTransfer averages, BN stats, scheduler counters, PRNG key) round-trips,
so training resumes exactly.

Format: a single .npz of flattened leaves + a pickled treedef-free key list
(pure numpy — portable, no framework state).  `partial_restore` merges a
checkpoint into an existing state while skipping selected key prefixes,
reproducing SLARDA's head-skipping partial load
(Comparison/SLARDA/train.py:192-195).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        flat[jax.tree_util.keystr(path)] = np.asarray(jax.device_get(leaf))
    return flat


def save_checkpoint(path: str, state) -> None:
    """Serialize a pytree's leaves keyed by their tree paths."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten(state))


def restore_checkpoint(path: str, like):
    """Restore into the structure of ``like`` (the template pytree)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    leaves_paths = jax.tree_util.tree_leaves_with_path(like)
    new_leaves = []
    for p, leaf in leaves_paths:
        key = jax.tree_util.keystr(p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        saved = data[key]
        new_leaves.append(jax.numpy.asarray(saved).astype(np.asarray(leaf).dtype))
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def partial_restore(path: str, like, skip_substrings: Iterable[str]):
    """Restore leaves whose path does NOT contain any skip substring;
    keep ``like``'s value elsewhere (e.g. skip the 'hidden' classifier head
    like SLARDA's weight transfer)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    skip = tuple(skip_substrings)
    new_leaves = []
    for p, leaf in jax.tree_util.tree_leaves_with_path(like):
        key = jax.tree_util.keystr(p)
        if any(s in key for s in skip) or key not in data:
            new_leaves.append(leaf)
        else:
            new_leaves.append(jax.numpy.asarray(data[key]).astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(like), new_leaves)


# --------------------------------------------------------------- orbax -----

def save_checkpoint_orbax(path: str, state) -> None:
    """Orbax backend (async-capable, sharding-aware) for pod-scale states.

    The .npz format above is the default (single-host, dependency-free);
    orbax becomes preferable once states are sharded across a mesh.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()


def restore_checkpoint_orbax(path: str, like):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
