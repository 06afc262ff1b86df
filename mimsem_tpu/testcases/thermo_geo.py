"""Thermogeostrophic instability test case (src/ThermoGeo.cpp:25-72).

Solid-body zonal flow in gradient balance with buoyancy
s = g (1 + 0.05 (h0/h)^2); runs 5 days at dt = 30 s with the EEC thermal SW.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..basis import make_basis
from ..mesh.cubed_sphere import cubed_sphere_mesh, RAD_SPHERE
from ..mesh.topology import build_topology
from ..mesh.geometry import build_geometry
from ..ops.local_form import LocalOps
from ..models.thermal_swe import ThermalSWEqn

RAD_EARTH = 6371220.0
GRAV = 9.80616
OMEGA = 7.292e-5
U0 = 2.0 * jnp.pi * RAD_EARTH / (12.0 * 24.0 * 3600.0)
H0 = 2.94e4 / GRAV


def u_init(lon, lat):
    return U0 * jnp.cos(lat)


def v_init(lon, lat):
    return jnp.zeros_like(lon)


def h_init(lon, lat):
    return H0 - (1.0 / GRAV) * (RAD_EARTH * OMEGA * U0 + 0.5 * U0 * U0) \
        * jnp.sin(lat) ** 2


def s_init(lon, lat):
    h = h_init(lon, lat)
    return GRAV * (1.0 + 0.05 * (H0 / h) ** 2)


def build(ne: int, p: int = 3, dt: float = 30.0, dtype=None, el_sharding=None):
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype, el_sharding=el_sharding)
    tsw = ThermalSWEqn(ops, dt=dt, omega=OMEGA)
    tol = 1e-13 if dtype == jnp.float64 else 1e-6
    u = ops.proj1(u_init, v_init, tol=tol)
    h = ops.proj2(h_init)
    s = ops.proj2(s_init)
    S = ops.solve_M2(ops.apply_M2h(s, h), tol=tol)
    return tsw, u, h, S
