"""Quadrature-weighted error norms, integrals and conservation monitors.

Parity with the reference diagnostics:
  err0/err1/err2  -- relative L1/L2/Linf vs analytic (src/SWEqn_Picard.cpp:981-1200)
  int0/int2/intE  -- conservation integrals (src/SWEqn_Picard.cpp:1202-1323)
All reductions are jnp sums -> XLA reductions (psum across shards under pjit),
replacing the reference's MPI_Allreduce.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.forms import SpaceOps


def _wd(ops: SpaceOps):
    return ops.W * ops.det  # (nel, nq)


def _norms(err, mag, wd):
    l1 = jnp.sum(wd * jnp.abs(err)) / jnp.sum(wd * jnp.abs(mag))
    l2 = jnp.sqrt(jnp.sum(wd * err ** 2) / jnp.sum(wd * mag ** 2))
    k = jnp.argmax(wd * jnp.abs(err))
    li = (wd * jnp.abs(err)).ravel()[k] / (wd * jnp.abs(mag)).ravel()[k]
    return jnp.stack([l1, l2, li])


def err0(ops: SpaceOps, u0, fana):
    """Relative L1/L2/Linf error of a 0-form vs fana(lon, lat)."""
    wd = _wd(ops)
    un = ops.interp0(u0)
    ua = fana(ops.lonlat[..., 0], ops.lonlat[..., 1])
    return _norms(un - ua, ua, wd)


def err1(ops: SpaceOps, u1, fu, fv):
    wd = _wd(ops)
    up = ops.interp1_phys(u1)
    ua = fu(ops.lonlat[..., 0], ops.lonlat[..., 1])
    va = fv(ops.lonlat[..., 0], ops.lonlat[..., 1])
    err = jnp.sqrt((up[..., 0] - ua) ** 2 + (up[..., 1] - va) ** 2)
    mag = jnp.sqrt(ua ** 2 + va ** 2)
    l1 = jnp.sum(wd * err) / jnp.sum(wd * mag)
    l2 = jnp.sqrt(jnp.sum(wd * err ** 2) / jnp.sum(wd * mag ** 2))
    k = jnp.argmax(wd * err)
    li = (wd * err).ravel()[k] / jnp.maximum((wd * mag).ravel()[k], 1e-300)
    return jnp.stack([l1, l2, li])


def err2(ops: SpaceOps, u2, fana, lat_cap=None, mag=None):
    """lat_cap (e.g. 0.45*pi) masks polar caps like the reference's Williamson2
    h-error (src/SWEqn_Picard.cpp:1167).  mag: optional separate field for the
    normalizing magnitude (e.g. the full depth when u2 is a perturbation)."""
    wd = _wd(ops)
    if lat_cap is not None:
        wd = wd * (jnp.abs(ops.lonlat[..., 1]) <= lat_cap)
    un = ops.interp2_phys(u2)
    ua = fana(ops.lonlat[..., 0], ops.lonlat[..., 1])
    ma = ua if mag is None else mag(ops.lonlat[..., 0], ops.lonlat[..., 1])
    return _norms(un - ua, ma, wd)


def int0(ops: SpaceOps, u0):
    return jnp.sum(_wd(ops) * ops.interp0(u0))


def int2(ops: SpaceOps, u2):
    return jnp.sum(_wd(ops) * ops.interp2_phys(u2))


def intE_sw(ops: SpaceOps, u1, h2, grav, b2=None):
    """Shallow-water total energy 0.5*(g(h+b)^2 + h|u|^2) (src/SWEqn_Picard.cpp:1276-1323)."""
    wd = _wd(ops)
    up = ops.interp1_phys(u1)
    hq = ops.interp2_phys(h2)
    bq = 0.0 if b2 is None else ops.interp2_phys(b2)
    return jnp.sum(wd * 0.5 * (grav * (hq + bq) ** 2
                               + hq * (up[..., 0] ** 2 + up[..., 1] ** 2)))
