"""Multi-chip SPMD layout over a jax device mesh.

The reference's only distributed axis is horizontal domain decomposition (6n^2
MPI ranks, one cubed-sphere subdomain each; SURVEY.md section 2.6).  The
TPU-native analogue: shard the element dimension of every element-batched
array across a 1-D device mesh and let GSPMD insert the collectives for the
DOF-vector gathers/scatter-adds (the analogue of PETSc VecScatter halos) and
for reductions (the analogue of MPI_Allreduce).

Layout: element arrays sharded on axis 0 in contiguous whole-row blocks.
When the row count divides the device count, LocalOps activates the
owner-computes shard_map DSS (spmd_dss.py): in-face sums local, row-boundary
strips over nearest-neighbor ppermute, panel edges + vertices over one
packed boundary psum -- measured 54x less collective traffic than the GSPMD
fallback (69 kB vs 3.7 MB per ne=4 SW step; scripts/analyze_collectives.py).
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
