"""Checkpoint / resume for controller state and hyperparameters.

The reference has no in-library checkpointing (SURVEY.md §5.4): users manually
clone ``mppi.U`` (tests/auto_tune_parameters.py:256,268) and pickle results.
Here controller state is an explicit pytree, so snapshot/restore is exact and
trivially serializable; ``save``/``load`` write a single ``.npz`` with the pytree
structure — no extra dependencies (orbax works too, since state is a pytree).
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def snapshot(ctrl):
    """Return an exact, immutable snapshot of a controller's mutable state:
    (solver state pytree, tunable params pytree)."""
    return (ctrl._state, ctrl._params)


def restore(ctrl, snap):
    """Restore a snapshot taken with :func:`snapshot` on a controller of the
    same configuration."""
    state, params = snap
    ctrl._state = state
    ctrl._params = params
    return ctrl


def save(path: str, pytree):
    """Serialize an arbitrary pytree of arrays to a single .npz file."""
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(_treedef_repr(treedef)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load(path: str, like=None):
    """Load a pytree saved with :func:`save`.

    :param like: optional example pytree whose structure is used to rebuild
        (exact treedef round-trips are only guaranteed with ``like``).
    """
    data = np.load(path, allow_pickle=False)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return leaves


def save_controller(path: str, ctrl):
    """Persist a controller's full resumable state (solver state + params)."""
    save(path, snapshot(ctrl))


def load_controller(path: str, ctrl):
    """Resume a controller from :func:`save_controller` output.  The controller
    must be constructed with the same configuration (shapes must match)."""
    snap = load(path, like=snapshot(ctrl))
    return restore(ctrl, snap)


def _treedef_repr(treedef):
    return str(treedef)
