"""Multi-chip SPMD layout over a jax device mesh.

The reference's only distributed axis is horizontal domain decomposition (6n^2
MPI ranks, one cubed-sphere subdomain each; SURVEY.md section 2.6).  The
TPU-native analogue: shard the element dimension of every element-batched
array across a 1-D device mesh and let GSPMD insert the collectives for the
DOF-vector gathers/scatter-adds (the analogue of PETSc VecScatter halos) and
for reductions (the analogue of MPI_Allreduce).

Round-1 layout: element arrays sharded on axis 0; global DOF vectors
replicated.  The scatter-add then lowers to a partial-sum + all-reduce over
ICI.  (A halo-exchange owner-computes layout is the planned optimization.)
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def element_sharding(mesh: Mesh, axis: str = "x") -> NamedSharding:
    """Shard dim 0 (the element dimension) across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
