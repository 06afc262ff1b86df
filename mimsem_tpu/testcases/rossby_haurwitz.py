"""Rossby-Haurwitz wavenumber-4 test case (src/RossbyHaurwitz.cpp:20-102).

Classic Williamson TC6 constants: omega = K = 7.848e-6, R = 4, H0 = 8000 m;
dt = 180 s, two weeks.  Run with the semi-implicit Picard SW solver.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..basis import make_basis
from ..mesh.cubed_sphere import cubed_sphere_mesh, RAD_SPHERE
from ..mesh.topology import build_topology
from ..mesh.geometry import build_geometry
from ..ops.local_form import LocalOps
from ..models.swe import SWEqn

ANGFREQ = 7.292e-5
GRAV = 9.80616
RH_OMEGA = 7.848e-6
RH_K = 7.848e-6
RH_R = 4.0
H0 = 8.0e3
A = RAD_SPHERE


def u_init(lon, lat):
    ct, st = jnp.cos(lat), jnp.sin(lat)
    return (A * RH_OMEGA * ct
            + A * RH_K * ct ** (RH_R - 1.0) * (RH_R * st * st - ct * ct)
            * jnp.cos(RH_R * lon))


def v_init(lon, lat):
    ct, st = jnp.cos(lat), jnp.sin(lat)
    return -A * RH_K * RH_R * ct ** (RH_R - 1.0) * st * jnp.sin(RH_R * lon)


def h_init(lon, lat):
    ct = jnp.cos(lat)
    R = RH_R
    a = (0.5 * RH_OMEGA * (2.0 * ANGFREQ + RH_OMEGA) * ct * ct
         + 0.25 * RH_K * RH_K * ct ** (2.0 * R)
         * ((R + 1.0) * ct * ct + (2.0 * R * R - R - 2.0) - 2.0 * R * R * ct ** -2.0))
    b = (2.0 * (ANGFREQ + RH_OMEGA) * RH_K / (R + 1.0) / (R + 2.0) * ct ** R
         * ((R * R + 2.0 * R + 2.0) - (R + 1.0) ** 2 * ct * ct))
    c = 0.25 * RH_K * RH_K * ct ** (2.0 * R) * ((R + 1.0) * ct * ct - (R + 2.0))
    return (H0 + A * A * (a + b * jnp.cos(R * lon) + c * jnp.cos(2.0 * R * lon))
            / GRAV)


def build(ne: int, p: int = 3, dt: float = 180.0, dtype=None, el_sharding=None,
          **kw):
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype, el_sharding=el_sharding)
    kw.setdefault('h_base', H0)
    sw = SWEqn(ops, dt=dt, grav=GRAV, omega=ANGFREQ, **kw)
    tol = 1e-13 if dtype == jnp.float64 else 1e-6
    u = ops.proj1(u_init, v_init, tol=tol)
    hp = ops.proj2(lambda lon, lat: h_init(lon, lat) - H0)
    return sw, u, hp
