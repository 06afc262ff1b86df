"""3D hydrostatic mountain gravity wave over an isolated circular hill.

The classic validation of a terrain-following vertical coordinate (the
capability Geom::initTopog latently provides, eul/Geom.cpp:743-761, but no
reference driver exercises -- every upstream f_topog returns 0,
eul/HeldSuarez.cpp:234-236).  Uniform flow U0 over a circular cosine hill
of half-width A in a constant-stability (N^2 = const) atmosphere radiates
a steady vertically-propagating gravity-wave train:

  * regime N*A/U0 = 10  -> hydrostatic waves, phase lines tilt UPSTREAM
    with height, vertical wavelength lambda_z = 2 pi U0 / N (~6.3 km here)
  * surface forcing w(z=0) ~ U0 * dh/dx, amplitude ~ U0*H0/A maintained
    aloft (Smith 1980, linear theory for the 3D hill)

Setup: doubly-periodic LX x LX box, ZTOP with a graded Rayleigh sponge
absorbing the wave train before the rigid lid reflects it back, impulsive
start from the hydrostatically-balanced stratified state.
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

THETA_0 = 288.0
NSQ = 1.0e-4          # Brunt-Vaisala N^2 [1/s^2]
U0 = 10.0             # inflow [m/s]
LX = 240.0e3          # domain width [m]
ZTOP = 21.0e3         # lid height [m]
H0 = 400.0            # hill height [m]
A_HILL = 10.0e3       # hill half-width [m] -> N*A/U0 = 10 (hydrostatic)


def theta_of_z(z):
    """Constant-N^2 potential temperature: theta = theta0 exp(N^2 z / g)."""
    return THETA_0 * jnp.exp(NSQ * z / GRAVITY)


def exner_of_z(z):
    """Hydrostatic Exner for constant N^2: cp dPi/dz = -g/theta(z)."""
    # integral of -g/theta: (g^2/(N^2 theta0)) (exp(-N^2 z/g) - 1)
    return CP + (GRAVITY ** 2 / (NSQ * THETA_0)) * (
        jnp.exp(-NSQ * z / GRAVITY) - 1.0)


def rho_init(x, z):
    pi_n = exner_of_z(z) / CP
    return (P0 / (RD * theta_of_z(z))) * pi_n ** (CV / RD)


def rt_init(x, z):
    return rho_init(x, z) * theta_of_z(z)


def exner_init(x, z):
    return exner_of_z(z)


def topog(x, y):
    """Circular cosine hill centred upstream of the domain midpoint."""
    r = np.sqrt((x - 0.4 * LX) ** 2 + (y - 0.5 * LX) ** 2)
    return np.where(r < A_HILL,
                    H0 * 0.5 * (1.0 + np.cos(np.pi * r / A_HILL)), 0.0)


def build(ne: int = 12, p: int = 3, nk: int = 42, dt: float = 4.0,
          dtype=None, el_sharding=None, rayleigh: float = 0.05,
          sponge_levels: int = 8, **kw):
    """ne=12/p=3 resolves the A=10 km hill with ~3 nodes per half-width
    (dx_node ~ 6.7 km); nk=42 uniform 500 m levels put ~3 vertical
    wavelengths below the 8-level (~4 km) graded sponge."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mesh = periodic_box_mesh(ne, lx=LX)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype,
                   el_sharding=el_sharding)
    zl = np.linspace(0.0, ZTOP, nk + 1)
    ll = np.asarray(geom.lonlat)
    levs = terrain_following_levels(zl, np.asarray(topog(ll[..., 0],
                                                         ll[..., 1])))
    vo = VerticalOps(ops, levs)
    # biharmonic momentum viscosity ON (the eul-driver default,
    # eul/HorizSolve.cpp:35): the first inviscid run of this case grew a
    # lee-slope near-surface shear instability from |w| 1.2 -> 55 m/s over
    # hours 3-5 and NaN'd -- the same failure family as the round-4
    # inviscid GravWave (demo/mountain_wave summary).  The box Bubble
    # reference disables viscosity for its 400 s convective scale; a 6 h
    # stratified shear flow is the regime the knob exists for.
    kw.setdefault('do_visc', True)
    eul = Euler3D(ops, vo, dt=dt, rayleigh=rayleigh,
                  rayleigh_levels=sponge_levels, **kw)

    rho = eul.project_layers(rho_init)
    rt = eul.project_layers(rt_init)
    exner = eul.project_layers(exner_init)
    velx = eul.project_velx(lambda x, z: U0 * jnp.ones(x.shape[:-1]),
                            lambda x, z: jnp.zeros(x.shape[:-1]))
    w = jnp.zeros((nk - 1, ops.nel, p * p), ops.dtype)
    return eul, (velx, w, rho, rt, exner, velx)
