"""3D rising warm bubble in a doubly-periodic 1 km box.

Reference: box/Bubble.cpp:24-90 -- NK=150 uniform levels to ZTOP=1500 m,
theta0=300 K isentropic hydrostatic base state, +0.25 K cosine bubble of
radius 250 m centred at (Lx/2, Lx/2, 350 m); dt=0.01 s, viscosity off.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..basis import make_basis
from ..mesh.box import periodic_box_mesh
from ..mesh.topology import build_topology
from ..mesh.geometry import build_geometry
from ..ops.local_form import LocalOps
from ..models.vertical import (VerticalOps, terrain_following_levels,
                               RD, CP, CV, P0, GRAVITY)
from ..models.euler3d import Euler3D

THETA_0 = 300.0
LX = 1000.0
ZTOP = 1500.0


def exner_of_z(z):
    return CP * (1.0 - GRAVITY * z / (CP * THETA_0)) ** 1.0


def pres(z):
    return P0 * (1.0 - GRAVITY * z / (CP * THETA_0)) ** (CP / RD)


def exner_init(x, z):
    return CP * (pres(z) / P0) ** (RD / CP)


def rho_init(x, z):
    return (P0 / (RD * THETA_0)) * (exner_init(x, z) / CP) ** (CV / RD)


def theta_init(x, z):
    xi = x[..., 0] - 0.5 * LX
    yi = x[..., 1] - 0.5 * LX
    zi = z - 350.0
    r = jnp.sqrt(xi * xi + yi * yi + zi * zi)
    return THETA_0 + jnp.where(r < 250.0,
                               0.25 * (1.0 + jnp.cos(jnp.pi * r / 250.0)), 0.0)


def rt_init(x, z):
    return rho_init(x, z) * theta_init(x, z)


def build(ne: int = 10, p: int = 3, nk: int = 150, dt: float = 0.01,
          lx: float = LX, ztop: float = ZTOP, dtype=None, el_sharding=None,
          topog=None, **kw):
    """topog: optional callable (x, y) -> surface height at the horizontal
    quadrature points; builds terrain-following levels (Geom::initTopog,
    eul/Geom.cpp:743-761) instead of flat ones."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mesh = periodic_box_mesh(ne, lx=lx)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype, el_sharding=el_sharding)
    zl = np.linspace(0.0, ztop, nk + 1)
    if topog is not None:
        ll = np.asarray(geom.lonlat)            # (nel, nq, 2) = x/y in the box
        levs = terrain_following_levels(zl, np.asarray(topog(ll[..., 0],
                                                            ll[..., 1])))
    else:
        levs = zl[:, None, None] * np.ones((1, ops.nel, basis.nq))
    vo = VerticalOps(ops, levs)
    eul = Euler3D(ops, vo, dt=dt, do_visc=False, **kw)

    rho = eul.project_layers(lambda x, z: rho_init(x, z))
    rt = eul.project_layers(lambda x, z: rt_init(x, z))
    exner = eul.project_layers(lambda x, z: exner_init(x, z))
    velx = jnp.zeros((nk, ops.ln1), ops.dtype)
    w = jnp.zeros((nk - 1, ops.nel, p * p), ops.dtype)
    return eul, (velx, w, rho, rt, exner, velx)
