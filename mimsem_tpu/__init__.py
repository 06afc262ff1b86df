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
import os as _os

import jax as _jax

# Matmul precision: HIGHEST by default.  The TPU default (bfloat16 inputs)
# costs ~8 mantissa bits per contraction; with SI-scaled coefficient spaces
# (2-form DOFs carry det*R^2*thick ~ 1e16..1e19) that noise drove the
# diagnosed potential temperature negative inside the entropy-variable
# vertical solve, so log(theta) NaN'd on TPU while CPU f32 was fine.  Every
# contraction in this framework has inner dimension <= nq ~ 16 (shared basis
# tables), far below MXU bf16-tiling profitability, so full-precision
# accumulation is effectively free here.  Override with
# MIMSEM_MATMUL_PRECISION={default,high,highest}.
_prec = _os.environ.get("MIMSEM_MATMUL_PRECISION", "highest")
if _prec != "default" and _jax.config.jax_default_matmul_precision is None:
    # respect a precision an embedding application already configured (only
    # force the default when the global config is still unset)
    _jax.config.update("jax_default_matmul_precision", _prec)

from . import basis, mesh, ops

__version__ = "0.1.0"
