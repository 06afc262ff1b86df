"""Thermal shallow water Galewsky test case (src/GalewskyTSW_2.cpp:24-100).

Galewsky jet + height perturbation, with buoyancy field
s = g - 0.1 g * (the Gaussian perturbation); S initialized as M2^-1 M2h(h) s
(src/GalewskyTSW_2.cpp:121-127).  dt = 30 s, SSP-RK3.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..basis import make_basis
from ..mesh.cubed_sphere import cubed_sphere_mesh
from ..mesh.topology import build_topology
from ..mesh.geometry import build_geometry
from ..ops.local_form import LocalOps
from ..models.thermal_swe import ThermalSWEqn
from .galewsky import u_init, v_init, h_init, GRAV, OMEGA


def s_init(lon, lat):
    alpha, beta, phi2 = 1.0 / 3.0, 1.0 / 15.0, jnp.pi / 4.0
    pert = jnp.cos(lat) * jnp.exp(-(lon / alpha) ** 2) \
        * jnp.exp(-((phi2 - lat) / beta) ** 2)
    return GRAV * (1.0 - 0.1 * pert)


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
