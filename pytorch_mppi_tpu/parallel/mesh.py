"""Device-mesh construction and multi-host initialization helpers.

The reference has no distributed code at all (SURVEY.md §2.4: no NCCL/MPI/
torch.distributed anywhere); scaling across chips/hosts is a net-new TPU-native
capability.  The backend is JAX's built-ins: ``jax.distributed.initialize`` for
multi-host process groups, ``jax.sharding.Mesh`` + GSPMD sharding constraints for
collectives that ride ICI within a slice and DCN across slices.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)

__all__ = ["make_mesh", "initialize_multihost", "NamedSharding", "PartitionSpec", "Mesh"]


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "k"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    :param shape: mesh shape; defaults to all devices on the last axis
        (e.g. ``(1, n_devices)`` for axis_names ("data", "k")).
    :param axis_names: mesh axis names; the MPPI solvers shard plants over "data"
        and samples over "k" by convention.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the multi-host runtime (no-op when already initialized or
    single-process).  Thin wrapper over ``jax.distributed.initialize``."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:  # already initialized / single host
        logger.info("multihost initialize skipped: %s", e)
