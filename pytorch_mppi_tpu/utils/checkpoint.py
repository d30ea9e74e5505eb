"""Checkpoint / resume for controller state and hyperparameters.

The reference has no in-library checkpointing (SURVEY.md §5.4): users manually
clone ``mppi.U`` (tests/auto_tune_parameters.py:256,268) and pickle results.
Here controller state is an explicit pytree, so snapshot/restore is exact and
trivially serializable.

``save``/``load`` write a single ``.npz`` whose structure record is
**self-describing**: the pytree layout (dicts, tuples, the package's
named-tuple types, typed PRNG keys) is serialized as JSON alongside the leaf
arrays, so ``load()`` round-trips in a *fresh interpreter* with no ``like=``
example pytree — no pickle, no extra dependencies (orbax also works, since
everything is a pytree).
"""
from __future__ import annotations

import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 2


def _namedtuple_registry():
    # resolved lazily to avoid an import cycle (config imports nothing from
    # utils, but ops.solve does)
    from ..config import (
        KMPPIParams,
        KMPPIState,
        MPPIParams,
        MPPIState,
        SMPPIParams,
        SMPPIState,
    )
    from ..ops.solve import BatchedState

    return {
        cls.__name__: cls
        for cls in (
            MPPIParams, SMPPIParams, KMPPIParams,
            MPPIState, SMPPIState, KMPPIState, BatchedState,
        )
    }


_EXTRA_NAMEDTUPLES: dict = {}


def register_checkpoint_namedtuple(cls):
    """Register a user NamedTuple so it survives a save/load round trip by
    name (the package's own state/params types are pre-registered)."""
    _EXTRA_NAMEDTUPLES[cls.__name__] = cls
    return cls


def _is_typed_key(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key)


def _encode(obj, leaves: list):
    """Recursively encode a pytree node into a JSON-able spec, appending leaf
    arrays to ``leaves`` in depth-first order."""
    if obj is None:
        return {"k": "none"}
    if isinstance(obj, dict):
        items = sorted(obj.items())  # match jax's sorted-dict flatten order
        return {
            "k": "dict",
            "keys": [k for k, _ in items],
            "vals": [_encode(v, leaves) for _, v in items],
        }
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        return {
            "k": "nt",
            "cls": type(obj).__name__,
            "fields": [_encode(v, leaves) for v in obj],
        }
    if isinstance(obj, (tuple, list)):
        return {
            "k": "tuple" if isinstance(obj, tuple) else "list",
            "items": [_encode(v, leaves) for v in obj],
        }
    if isinstance(obj, str):
        return {"k": "str", "v": obj}
    if _is_typed_key(obj):
        idx = len(leaves)
        leaves.append(np.asarray(jax.random.key_data(obj)))
        return {"k": "key", "i": idx, "impl": str(jax.random.key_impl(obj))}
    # array / scalar leaf
    idx = len(leaves)
    leaves.append(np.asarray(obj))
    py = type(obj).__name__ if isinstance(obj, (bool, int, float)) else None
    return {"k": "leaf", "i": idx, "py": py}


def _decode(spec, leaves):
    kind = spec["k"]
    if kind == "none":
        return None
    if kind == "dict":
        return {
            k: _decode(v, leaves) for k, v in zip(spec["keys"], spec["vals"])
        }
    if kind == "nt":
        registry = {**_namedtuple_registry(), **_EXTRA_NAMEDTUPLES}
        fields = [_decode(f, leaves) for f in spec["fields"]]
        cls = registry.get(spec["cls"])
        if cls is None:
            logger.warning(
                "checkpoint contains unregistered NamedTuple %r; returning a "
                "plain tuple (register it with register_checkpoint_namedtuple)",
                spec["cls"],
            )
            return tuple(fields)
        return cls(*fields)
    if kind == "tuple":
        return tuple(_decode(v, leaves) for v in spec["items"])
    if kind == "list":
        return [_decode(v, leaves) for v in spec["items"]]
    if kind == "str":
        return spec["v"]
    if kind == "key":
        return jax.random.wrap_key_data(
            jnp.asarray(leaves[spec["i"]]), impl=spec["impl"]
        )
    if kind == "leaf":
        arr = leaves[spec["i"]]
        if spec.get("py") == "bool":
            return bool(arr)
        if spec.get("py") == "int":
            return int(arr)
        if spec.get("py") == "float":
            return float(arr)
        return jnp.asarray(arr)
    raise ValueError(f"unknown checkpoint node kind {kind!r}")


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
    """Serialize a pytree of arrays (dicts / lists / tuples / the package's
    NamedTuple types / typed PRNG keys) to a single self-describing .npz."""
    leaves: list = []
    spec = _encode(pytree, leaves)
    arrays = {f"leaf_{i}": x for i, x in enumerate(leaves)}
    header = json.dumps({"version": _FORMAT_VERSION, "spec": spec})
    arrays["__spec__"] = np.frombuffer(header.encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load(path: str, like=None):
    """Load a pytree saved with :func:`save`.

    The structure is rebuilt from the file's own spec — a fresh interpreter
    needs no example pytree.  ``like=`` overrides the stored structure (kept
    for compatibility; the leaf order must match).
    """
    data = np.load(path, allow_pickle=False)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    raw = [data[f"leaf_{i}"] for i in range(n)]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in raw]
        )
    if "__spec__" not in data.files:
        raise ValueError(
            f"{path} has no structure record (pre-v2 checkpoint?); pass like= "
            f"with an example pytree to rebuild it"
        )
    header = json.loads(bytes(data["__spec__"]).decode())
    return _decode(header["spec"], raw)


def save_controller(path: str, ctrl):
    """Persist a controller's full resumable state (solver state + params)."""
    save(path, snapshot(ctrl))


def load_controller(path: str, ctrl):
    """Resume a controller from :func:`save_controller` output.  The controller
    must be constructed with the same configuration (same class, same shapes)."""
    snap = load(path)
    want_def = jax.tree_util.tree_structure(snapshot(ctrl))
    got_def = jax.tree_util.tree_structure(snap)
    if got_def != want_def:
        raise ValueError(
            f"checkpoint structure {got_def} does not match the controller's "
            f"{want_def} — was it saved from the same controller class "
            f"(MPPI/SMPPI/KMPPI) and configuration? Note: the default "
            f"prng_impl='auto' selects the hardware PRNG on TPU but threefry "
            f"on CPU, so a checkpoint saved on one backend needs the "
            f"controller constructed with the SAME prng_impl to restore on "
            f"the other (e.g. prng_impl=None for a CPU-saved checkpoint)."
        )
    for got, want in zip(
        jax.tree_util.tree_leaves(snap), jax.tree_util.tree_leaves(snapshot(ctrl))
    ):
        # A PRNG-implementation mismatch (rbg-saved checkpoint restored into a
        # threefry controller, or vice versa) surfaces here as a key-leaf
        # dtype/shape difference, not as a structure mismatch — diagnose it
        # explicitly so the error names the actual knob (prng_impl)
        got_key, want_key = _is_typed_key(got), _is_typed_key(want)
        if got_key != want_key or (
            got_key and str(jax.random.key_impl(got)) != str(jax.random.key_impl(want))
        ):
            def _impl(x, is_key):
                return str(jax.random.key_impl(x)) if is_key else f"raw {jnp.shape(x)} {jnp.dtype(x)}"
            raise ValueError(
                f"checkpoint PRNG key implementation ({_impl(got, got_key)}) does "
                f"not match the controller's ({_impl(want, want_key)}). The default "
                f"prng_impl='auto' selects the hardware PRNG ('rbg') on TPU but "
                f"threefry on CPU, so restoring a checkpoint saved on another "
                f"backend needs the controller constructed with the SAME "
                f"prng_impl it was saved under (e.g. prng_impl=None for a "
                f"CPU-saved checkpoint, prng_impl='rbg' for a TPU-saved one)."
            )
        if jnp.shape(got) != jnp.shape(want):
            raise ValueError(
                f"checkpoint leaf shape {jnp.shape(got)} does not match the "
                f"controller's {jnp.shape(want)} — was it built with the same "
                f"configuration?"
            )
    return restore(ctrl, snap)
