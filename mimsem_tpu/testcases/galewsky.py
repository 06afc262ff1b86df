"""Galewsky barotropic instability test case.

Reference: src/Galewsky.cpp:24-90 (Galewsky, Scott & Polvani, Tellus 56A, 2004).
Zonal jet in geostrophic balance (h by 1000-point meridional quadrature of the
balance integral) plus a Gaussian height perturbation.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..basis import make_basis
from ..mesh.cubed_sphere import cubed_sphere_mesh, RAD_SPHERE
from ..mesh.topology import build_topology
from ..mesh.geometry import build_geometry
from ..ops.forms import SpaceOps
from ..ops.local_form import LocalOps
from ..models.swe import SWEqn

RAD_EARTH = 6371220.0
GRAV = 9.80616 * (RAD_SPHERE / RAD_EARTH)
OMEGA = 7.292e-5
UMAX = 80.0 * (RAD_SPHERE / RAD_EARTH)
PHI0 = np.pi / 7.0
PHI1 = np.pi / 2.0 - PHI0
EN = np.exp(-4.0 / (PHI1 - PHI0) ** 2)
HHAT = 120.0 * (RAD_SPHERE / RAD_EARTH)
HBAR = 10000.0 * (RAD_SPHERE / RAD_EARTH)


def _u_profile(phi):
    xp = jnp if isinstance(phi, jnp.ndarray) else np
    eps = 1e-8
    inside = (phi > PHI0 + eps) & (phi < PHI1 - eps)
    arg = xp.where(inside, 1.0 / ((phi - PHI0) * (phi - PHI1) + 1e-300), 0.0)
    return xp.where(inside, (UMAX / EN) * xp.exp(xp.where(inside, arg, 0.0)), 0.0)


def u_init(lon, lat):
    return _u_profile(lat)


def v_init(lon, lat):
    return jnp.zeros_like(lon)


def h_init(lon, lat, ni: int = 1000):
    """Geostrophic balance by meridional quadrature (src/Galewsky.cpp:46-79)
    plus Gaussian perturbation."""
    lat = jnp.asarray(lat)
    sgn = jnp.where(lat > 0, 1.0, -1.0)
    dphi = jnp.abs(lat / ni)

    def body(ii, carry):
        h, phi_p = carry
        phi_p = phi_p + sgn * dphi
        u = _u_profile(phi_p)
        f = 2.0 * OMEGA * jnp.sin(phi_p)
        h = h - RAD_SPHERE * u * (f + jnp.tan(phi_p) * u / RAD_SPHERE) * dphi / GRAV
        # keep the carry dtype stable under jax_enable_x64 (weak-type promotion)
        return (h.astype(lat.dtype), phi_p.astype(lat.dtype))

    h, _ = jax.lax.fori_loop(0, ni, body, (jnp.full_like(lat, HBAR),
                                           jnp.zeros_like(lat)))
    alpha, beta, phi2 = 1.0 / 3.0, 1.0 / 15.0, jnp.pi / 4.0
    h = h + HHAT * jnp.cos(lat) * jnp.exp(-(lon / alpha) ** 2) \
            * jnp.exp(-((phi2 - lat) / beta) ** 2)
    return h


def build(ne: int, p: int = 3, dt: float = 360.0, dtype=None, el_sharding=None, **kw):
    import jax.numpy as _jnp
    if dtype is None:
        dtype = _jnp.float64 if jax.config.jax_enable_x64 else _jnp.float32
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype, el_sharding=el_sharding)
    kw.setdefault('h_base', HBAR)
    sw = SWEqn(ops, dt=dt, grav=GRAV, omega=OMEGA, **kw)
    u = ops.proj1(u_init, v_init, tol=1e-13 if dtype == _jnp.float64 else 1e-6)
    hp = ops.proj2(lambda lon, lat: h_init(lon, lat) - HBAR)
    return sw, u, hp
