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


def make_mesh2(dr: int, dc: int, axes=("x", "y")) -> Mesh:
    """2-D device mesh: dr row-blocks x dc column-blocks (the SURVEY 2.6
    (face, fy, fx) product decomposition -- rows span faces, columns split
    within faces).  Element arrays are stored tile-major (see
    LocalOps el_perm) so the flat element axis shards contiguously."""
    devs = jax.devices()
    if dr * dc > len(devs):
        raise ValueError(f"need {dr * dc} devices, have {len(devs)}")
    return Mesh(np.array(devs[:dr * dc]).reshape(dr, dc), tuple(axes))


def element_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (the element dimension) across the mesh (both axes when
    the mesh is 2-D; devices own contiguous tile-major chunks)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def choose_tiling(n_devices: int, rows: int, nex: int) -> tuple[int, int] | None:
    """Pick (Dr, Dc) with Dr*Dc == n_devices, Dr | rows, Dc | nex, preferring
    the most-square tiles (smallest per-device boundary).  None if no exact
    factorization divides the element grid."""
    best = None
    for dr in range(1, n_devices + 1):
        if n_devices % dr:
            continue
        dc = n_devices // dr
        if rows % dr or nex % dc:
            continue
        # per-device tile boundary length ~ rows/dr + nex/dc
        cost = rows // dr + nex // dc
        if best is None or cost < best[0]:
            best = (cost, dr, dc)
    return None if best is None else (best[1], best[2])


def tile_perm(rows: int, nex: int, dr: int, dc: int) -> np.ndarray:
    """Tile-major element permutation new_el -> old_el for a (dr, dc) device
    grid over the structural [rows, nex] element grid: device (i, j) owns the
    contiguous flat range [(i*dc+j)*R*C, ...) holding its [R, C] tile
    row-major."""
    assert rows % dr == 0 and nex % dc == 0, (rows, nex, dr, dc)
    R, C = rows // dr, nex // dc
    el = np.arange(rows * nex).reshape(dr, R, dc, C)
    return el.transpose(0, 2, 1, 3).reshape(-1)


def auto_mesh(n_devices: int, rows: int, nex: int, axes=("x", "y")):
    """Best-effort device mesh + element permutation for the [rows, nex]
    element grid: (mesh, el_perm).  el_perm is None for a plain 1-D row-block
    mesh (dc == 1, storage already contiguous)."""
    t = choose_tiling(n_devices, rows, nex)
    if t is None:
        return None, None
    dr, dc = t
    if dc == 1:
        return make_mesh(n_devices), None
    return make_mesh2(dr, dc, axes), tile_perm(rows, nex, dr, dc)
