"""Deformational flow advection test (src/DeformFlow.cpp; Nair & Lauritzen).

Time-reversing deformational velocity field advecting two cosine bells;
after one period T the tracer returns to its initial state.  The reference
runs nSteps=8000 at dt=T/8000 with explicit RK.  The velocity field is
time-dependent: the advection step takes u(t) rebuilt each step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..basis import make_basis
from ..mesh.cubed_sphere import cubed_sphere_mesh, RAD_SPHERE
from ..mesh.topology import build_topology
from ..mesh.geometry import build_geometry
from ..ops.local_form import LocalOps
from ..models.advection import AdvEqn

T_PERIOD = 5.0 * 24.0 * 3600.0
K_AMP = 10.0 * RAD_SPHERE / T_PERIOD


def velocity(ops, t):
    """Nair-Lauritzen case-4-like deformational flow with zonal background."""
    lon = ops.lonlat[..., 0]
    lat = ops.lonlat[..., 1]
    lp = lon - 2.0 * jnp.pi * t / T_PERIOD
    u = (K_AMP * jnp.sin(lp) ** 2 * jnp.sin(2 * lat)
         * jnp.cos(jnp.pi * t / T_PERIOD)
         + 2.0 * jnp.pi * RAD_SPHERE * jnp.cos(lat) / T_PERIOD)
    v = K_AMP * jnp.sin(2 * lp) * jnp.cos(lat) * jnp.cos(jnp.pi * t / T_PERIOD)
    fq = jnp.stack([u, v], axis=-1)
    return ops.solve_M1(ops.rhs_P1(fq), tol=1e-10)


def h_init(lon, lat):
    def bell(lonc, latc):
        r = RAD_SPHERE * jnp.arccos(jnp.clip(
            jnp.sin(latc) * jnp.sin(lat)
            + jnp.cos(latc) * jnp.cos(lat) * jnp.cos(lon - lonc), -1, 1))
        rr = 0.5 * RAD_SPHERE / 2.0
        return jnp.where(r < rr, 0.5 * (1 + jnp.cos(jnp.pi * r / rr)), 0.0)
    return 0.1 + 0.9 * (bell(5 * jnp.pi / 6, 0.0) + bell(7 * jnp.pi / 6, 0.0))


def build(ne: int, p: int = 3, nsteps: int = 8000, dtype=None):
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype)
    adv = AdvEqn(ops, dt=T_PERIOD / nsteps)
    h = ops.proj2(h_init)
    return adv, h
