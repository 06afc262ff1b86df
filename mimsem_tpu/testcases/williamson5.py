"""Williamson test case 5: zonal flow over an isolated mountain.

Reference: src/Williamson5.cpp:20-78 -- U0=20 m/s, H0=5960 m, alpha=0,
conical mountain b0=2000 m, radius pi/9 centred at (-pi/2, pi/6); the
mountain enters as the topography vector `bot` in the SW solver
(src/SWEqn_Picard.cpp:430-433, 727).
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

GRAV = 9.80616
OMEGA = 7.292e-5
U0 = 20.0
H0 = 5960.0


def u_init(lon, lat):
    return U0 * jnp.cos(lat)


def v_init(lon, lat):
    return jnp.zeros_like(lon)


def b_init(lon, lat):
    lat_c, lon_c = jnp.pi / 6.0, -jnp.pi / 2.0
    b0, rad = 2000.0, jnp.pi / 9.0
    r = jnp.sqrt((lon - lon_c) ** 2 + (lat - lat_c) ** 2)
    return jnp.where(r < rad, b0 * (1.0 - r / rad), 0.0)


def h_init(lon, lat):
    b = jnp.sin(lat)
    return H0 - (RAD_SPHERE * OMEGA * U0 + 0.5 * U0 * U0) * b * b / GRAV \
        - b_init(lon, lat)


def build(ne: int, p: int = 3, dt: float = 600.0, dtype=None, el_sharding=None,
          **kw):
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype, el_sharding=el_sharding)
    kw.setdefault('q_exact', True)
    kw.setdefault('nits', 4)
    kw.setdefault('h_base', H0)
    sw = SWEqn(ops, dt=dt, grav=GRAV, omega=OMEGA, bot_fn=b_init, **kw)
    tol = 1e-13 if dtype == jnp.float64 else 1e-6
    u = ops.proj1(u_init, v_init, tol=tol)
    hp = ops.proj2(lambda lon, lat: h_init(lon, lat) - H0)
    return sw, u, hp
