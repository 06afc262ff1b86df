"""mimsem_tpu: TPU-native mixed mimetic spectral element framework.

A ground-up JAX/XLA re-design with the capabilities of MiMSEM
(davelee2804/MiMSEM): geophysical flow solvers (2D advection, rotating and
thermal shallow water, 3D compressible Euler) built from mimetic spectral
elements on the cubed sphere and doubly-periodic box, with exact conservation
by construction.

Design: element-batched matrix-free operators (large shared-basis GEMMs on the
MXU), incidence operators as index arithmetic, batched dense block solves, and
compiler-friendly Krylov loops; multi-chip scaling via jax.sharding.
"""
from . import basis, mesh, ops

__version__ = "0.1.0"
