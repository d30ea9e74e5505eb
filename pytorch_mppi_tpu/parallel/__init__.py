"""Mesh-parallel MPPI: device meshes, sharded solves, multi-host init.

The reference's only parallelism is single-device batching (SURVEY.md §2.4).
This package provides the TPU-native scaling layer on top of the same solvers:

  * ``make_mesh`` / ``initialize_multihost`` — mesh + process-group setup
  * ``MPPI(..., mesh=mesh)`` — K-sample axis sharded over the mesh
  * ``MPPI_Batched(..., mesh=mesh)`` — N plants (and optionally K) sharded

Collectives are inserted by XLA's SPMD partitioner from sharding annotations
(3 small reductions per solve: min, sum, weighted-noise psum) and ride ICI.
Partitionable threefry makes sharded solves bit-identical to single-device runs.
"""
from .mesh import Mesh, NamedSharding, PartitionSpec, initialize_multihost, make_mesh

__all__ = [
    "make_mesh",
    "initialize_multihost",
    "Mesh",
    "NamedSharding",
    "PartitionSpec",
]
