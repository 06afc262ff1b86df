"""Solid-body rotation advection test (src/SolidBody.cpp:15-56).

A cosine-bell tracer advected once around the sphere by solid-body flow;
after one revolution the tracer should return to its initial position, and
total mass is conserved exactly.
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

U0 = 2.0 * jnp.pi * RAD_SPHERE / (12.0 * 24.0 * 3600.0)  # one revolution / 12 days


def u_init(lon, lat):
    return U0 * jnp.cos(lat)


def v_init(lon, lat):
    return jnp.zeros_like(lon)


def h_init(lon, lat):
    """Cosine bell centred on the equator at lon = 3pi/2 (Williamson TC1-like)."""
    rr = RAD_SPHERE / 3.0
    lonc, latc = 1.5 * jnp.pi, 0.0
    r = RAD_SPHERE * jnp.arccos(jnp.clip(
        jnp.sin(latc) * jnp.sin(lat)
        + jnp.cos(latc) * jnp.cos(lat) * jnp.cos(lon - lonc), -1.0, 1.0))
    return jnp.where(r < rr, 0.5 * (1.0 + jnp.cos(jnp.pi * r / rr)) * 1000.0, 0.0)


def build(ne: int, p: int = 3, dt: float = None, dtype=None, el_sharding=None):
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if dt is None:
        dt = 0.5 * 10424.88  # src/SolidBody.cpp:52-56
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype, el_sharding=el_sharding)
    adv = AdvEqn(ops, dt=dt)
    u = ops.proj1(u_init, v_init, tol=1e-13 if dtype == jnp.float64 else 1e-6)
    h = ops.proj2(h_init)
    return adv, u, h
