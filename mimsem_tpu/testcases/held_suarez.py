"""Held-Suarez idealized climate test (eul/HeldSuarez.cpp).

NK=16 sqrt-stretched levels to ZTOP (z_at_level, eul/HeldSuarez.cpp:124-128,
identical to UMJS14's mu=15 stretch), balanced base state (the reference
initializes from the UMJS14 background atmosphere with the perturbation
off), dt=120 s, 100 days, hs_forcing on (temperature relaxation + Rayleigh
boundary-layer friction, eul/VertOps.cpp compute_k_T / eul/Assembly.h
Umat_ray).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..basis import make_basis
from ..mesh.cubed_sphere import cubed_sphere_mesh, RAD_SPHERE
from ..mesh.topology import build_topology
from ..mesh.geometry import build_geometry
from ..ops.local_form import LocalOps
from ..models.vertical import VerticalOps, RD, CP, CV, P0
from ..models.euler3d import Euler3D
from . import umjs14

ZTOP = 30000.0
OMEGA = 7.29212e-5


def build(ne: int = 6, p: int = 3, nk: int = 16, dt: float = 120.0,
          dtype=None, el_sharding=None, **kw):
    # eul-build Rayleigh sponge (eul/VertSolve.cpp:32) is active for all
    # sphere Euler drivers in the reference
    kw.setdefault('rayleigh', 4.0 / 120.0)
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mesh = cubed_sphere_mesh(ne, radius=RAD_SPHERE)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype, el_sharding=el_sharding)
    # stretched levels, SAME sqrt-stretch as UMJS14: the reference's
    # HeldSuarez.cpp:124-128 z_at_level is identical to UMJS14.cpp's (mu=15).
    # Uniform levels put the bottom layer at ~1.9 km, and the projected
    # balanced state is then hydrostatically imbalanced enough to ring the
    # whole atmosphere into a NaN within ~400 steps (observed 2026-08-18).
    levs = umjs14.z_levels(nk)[:, None, None] \
        * np.ones((1, ops.nel, basis.nq))
    vo = VerticalOps(ops, levs)
    coriolis = lambda lon, lat: 2.0 * OMEGA * jnp.sin(lat)
    kw.setdefault('hs_forcing', True)
    eul = Euler3D(ops, vo, dt=dt, coriolis=coriolis, do_visc=True, **kw)

    A = RAD_SPHERE

    def rho_f(x, z):
        lam, phi = umjs14._latlon(x)
        return umjs14.pres(phi, z + A) / (RD * umjs14.temp(phi, z + A))

    def rt_f(x, z):
        lam, phi = umjs14._latlon(x)
        th = umjs14.temp(phi, z + A) \
            * (P0 / umjs14.pres(phi, z + A)) ** (RD / CP)
        return rho_f(x, z) * th

    def pi_f(x, z):
        lam, phi = umjs14._latlon(x)
        return CP * (umjs14.pres(phi, z + A) / P0) ** (RD / CP)

    rho = eul.project_layers(rho_f)
    rt = eul.project_layers(rt_f)
    exner = eul.project_layers(pi_f)

    def fu(x, z):
        lam, phi = umjs14._latlon(x)
        return umjs14.u_mean(phi, z + A)

    velx = eul.project_velx(fu, lambda x, z: jnp.zeros(x.shape[:-1], dtype))
    w = jnp.zeros((nk - 1, ops.nel, p * p), dtype)
    return eul, (velx, w, rho, rt, exner, velx)
