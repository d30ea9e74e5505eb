"""Ahead-of-time export of a controller's compiled solve for serving.

The reference deploys by shipping the Python class plus the user's dynamics
and cost functions to every serving host (there is no AOT story at all in
``/root/reference``).  On TPU the natural production artifact is the traced
program itself: :func:`export_solver` serializes the controller's jitted
solve to a **portable StableHLO artifact** (via ``jax.export``) together
with its current hyperparameters and solver state, producing ONE file that
a serving process can load and run with **no user dynamics/cost code, and
no retracing or recompilation of Python** — only XLA's final backend
compile of the embedded StableHLO happens at load site.

    ctrl = MPPI(dynamics, running_cost, nx, sigma, ...)
    deploy.export_solver(ctrl, "solver.mppi.npz", platforms=("cpu", "tpu"))

    # on the serving host (no dynamics/cost imports anywhere):
    solver = deploy.load_solver("solver.mppi.npz")
    action = solver.command(x0)

Guarantees and limits:

- the artifact embeds the *rectified* full solve (sampling, rollout,
  weighting, update — SURVEY.md §3.1) for the exact static config it was
  built from; shapes/dtypes of ``command`` inputs are fixed;
- ``platforms`` pins where the artifact may run (``jax.export`` checks at
  call time); pass ``("cpu", "tpu")`` for artifacts that serve on either;
- tunable hyperparameters stay *runtime inputs*: ``solver.params`` can be
  replaced (e.g. with a tuner's best result) without re-exporting, since
  sigma/mu/lambda/bounds are traced operands of the exported program;
- configs whose ``SpecificActionSampler`` consumes a per-call ``info``
  payload are exported with ``info=None`` (the payload is a Python-side
  argument; export freezes it) — a loud error at export time names the
  limitation;
- forward compatibility follows ``jax.export``'s guarantees (artifacts are
  readable by newer jax releases per its compatibility window).
"""
from __future__ import annotations

import json
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import checkpoint as _ckpt

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 1
_REGISTERED = False


def _register_serialization():
    """Register the package's NamedTuple pytrees with jax.export (idempotent).

    The serialized names are stable strings independent of module layout so
    artifacts survive refactors.
    """
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport

    from ..config import (
        Artifacts,
        KMPPIParams,
        KMPPIState,
        MPPIParams,
        MPPIState,
        SMPPIParams,
        SMPPIState,
    )
    from ..ops.solve import BatchedState

    for cls in (
        MPPIParams, SMPPIParams, KMPPIParams,
        MPPIState, SMPPIState, KMPPIState, BatchedState, Artifacts,
    ):
        try:
            jexport.register_namedtuple_serialization(
                cls, serialized_name=f"pytorch_mppi_tpu.{cls.__name__}"
            )
        except ValueError:
            # already registered (e.g. two controllers exported in-process)
            pass
    _REGISTERED = True


class ServingSolver:
    """A loaded deployment artifact: the compiled solve + params + state.

    Mirrors the controller's ``command`` contract (reference mppi.py:240-252)
    while being fully self-contained — the user dynamics/cost exist only as
    StableHLO inside the artifact.
    """

    def __init__(self, exported_shift, exported_no_shift, params, state,
                 dyn_params, meta):
        self._exp_shift = exported_shift
        self._exp_no_shift = exported_no_shift
        self.params = params
        self._state = state
        self.dyn_params = dyn_params
        self.meta = dict(meta)
        # per-solve artifact surface, same names as the controller
        self.cost_total = None
        self.cost_total_non_zero = None
        self.omega = None
        self.noise = None
        self.perturbed_action = None
        self.states = None
        self.actions = None

    @property
    def platforms(self):
        return tuple(self._exp_shift.platforms)

    @property
    def state(self):
        """The solver-state pytree (nominal sequence + PRNG key [+ variant
        extras]); swap it to reset or fork serving replicas."""
        return self._state

    @state.setter
    def state(self, value):
        self._state = value

    def command(self, x0, shift_nominal_trajectory: bool = True):
        """One MPC solve; threads the internal state exactly like the live
        controller."""
        exp = self._exp_shift if shift_nominal_trajectory else self._exp_no_shift
        x0 = jnp.asarray(x0, self.meta["dtype"])
        if self.meta["takes_info"]:
            out = exp.call(self.params, self._state, x0, None, self.dyn_params)
        else:
            out = exp.call(self.params, self._state, x0, self.dyn_params)
        new_state, action, artifacts = out
        self._state = new_state
        self.cost_total = artifacts.cost_total
        self.cost_total_non_zero = artifacts.cost_total_non_zero
        self.omega = artifacts.omega
        self.noise = artifacts.noise
        self.perturbed_action = artifacts.perturbed_action
        self.states = artifacts.states
        self.actions = artifacts.actions
        return action


def _example_x0(ctrl):
    from .. import controller as _c

    if isinstance(ctrl, _c.MPPI_Batched):
        return jnp.zeros((ctrl.N, ctrl.nx), ctrl.dtype)
    return jnp.zeros((ctrl.nx,), ctrl.dtype)


def export_solver(ctrl, path: Optional[str] = None, platforms=None,
                  x0_example=None) -> ServingSolver:
    """Export ``ctrl``'s compiled solve (+ current params/state) for serving.

    :param ctrl: a live ``MPPI``/``SMPPI``/``KMPPI``/``MPPI_Batched``.
    :param path: optional ``.npz`` destination (written with the same
        self-describing pytree format as ``utils.checkpoint``).
    :param platforms: lowering platforms tuple, e.g. ``("cpu", "tpu")``;
        default = the controller's current backend platform.
    :param x0_example: example state for shape inference; default zeros of
        ``(nx,)`` (or ``(N, nx)`` batched).  Pass a ``(B, nx)`` example to
        export the K-batched-state entry point (reference mppi.py:232-239).
    :returns: the in-memory :class:`ServingSolver` (already usable).
    """
    from jax import export as jexport

    from .. import controller as _c

    _register_serialization()
    if getattr(ctrl, "info", None) is not None:
        raise ValueError(
            "export_solver freezes info=None into the artifact, but this "
            "controller carries a live info payload; serving-side samplers "
            "cannot receive per-call info through an exported program"
        )
    takes_info = not isinstance(ctrl, _c.MPPI_Batched)
    x0 = _example_x0(ctrl) if x0_example is None else jnp.asarray(
        x0_example, ctrl.dtype
    )
    if platforms is None:
        platforms = (jax.default_backend(),)
    # SMPPI/KMPPI solve with assembled variant params (SMPPIParams/KMPPIParams)
    params = (
        ctrl._full_params() if hasattr(ctrl, "_full_params") else ctrl._params
    )

    def _export(fn):
        if takes_info:
            return jexport.export(jax.jit(fn), platforms=tuple(platforms))(
                params, ctrl._state, x0, None, ctrl.dynamics_params
            )
        return jexport.export(jax.jit(fn), platforms=tuple(platforms))(
            params, ctrl._state, x0, ctrl.dynamics_params
        )

    exp_shift = _export(ctrl._fns.step)
    exp_no_shift = _export(ctrl._fns.step_no_shift)
    meta = {
        "version": _FORMAT_VERSION,
        "class": type(ctrl).__name__,
        "platforms": list(platforms),
        "takes_info": takes_info,
        "dtype": str(np.dtype(ctrl.dtype)),
        "jax_version": jax.__version__,
    }
    solver = ServingSolver(
        exp_shift, exp_no_shift, params, ctrl._state,
        ctrl.dynamics_params, meta,
    )
    if path is not None:
        _ckpt.save(path, {
            "meta": json.dumps(meta),
            "blob_shift": np.frombuffer(exp_shift.serialize(), dtype=np.uint8),
            "blob_no_shift": np.frombuffer(
                exp_no_shift.serialize(), dtype=np.uint8
            ),
            "params": params,
            "state": ctrl._state,
            "dyn_params": ctrl.dynamics_params,
        })
        logger.info("exported %s solve for platforms %s to %s",
                    meta["class"], tuple(platforms), path)
    return solver


def load_solver(path: str) -> ServingSolver:
    """Load an :func:`export_solver` artifact.  Requires no user code: the
    dynamics/cost live as StableHLO inside the artifact."""
    from jax import export as jexport

    _register_serialization()
    tree = _ckpt.load(path)
    meta = json.loads(tree["meta"])
    if meta.get("version") != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported deploy-artifact version {meta.get('version')!r} "
            f"(this build reads version {_FORMAT_VERSION})"
        )
    exp_shift = jexport.deserialize(bytes(np.asarray(tree["blob_shift"])))
    exp_no_shift = jexport.deserialize(
        bytes(np.asarray(tree["blob_no_shift"]))
    )
    meta["dtype"] = jnp.dtype(meta["dtype"])
    return ServingSolver(
        exp_shift, exp_no_shift, tree["params"], tree["state"],
        tree["dyn_params"], meta,
    )
