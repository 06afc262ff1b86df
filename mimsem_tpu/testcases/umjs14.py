"""Baroclinic instability on the sphere (Ullrich, Melvin, Jablonowski &
Staniforth, QJRMS 2014) -- the flagship 3D configuration.

Reference: eul/UMJS14.cpp:24-225 -- NK=30 stretched levels to 30 km
(z = ZTOP (sqrt(mu f^2 + 1) - 1)/(sqrt(mu+1) - 1), mu=15), analytic balanced
atmosphere T(phi,r), p(phi,r), zonal wind from gradient-wind balance, plus a
tapered Gaussian-like velocity perturbation; dt=75 s, 12 days, Strang_ec HEVI
with biharmonic viscosity.
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
from ..models.vertical import (VerticalOps, terrain_following_levels,
                               RD, CP, CV, P0, GRAVITY)
from ..models.euler3d import Euler3D

A = RAD_SPHERE
OMEGA = 7.29212e-5
TE, TP = 310.0, 240.0
T0 = 0.5 * (TE + TP)
KP = 3.0
GAMMA = 0.005
ZT = 15000.0
ZTOP = 30000.0
LAMBDA_C = np.pi / 9.0
PHI_C = 2.0 * np.pi / 9.0
VP = 1.0
D0 = A / 6.0
MU = 15.0


def z_levels(nk):
    f = np.arange(nk + 1) / nk
    return ZTOP * (np.sqrt(MU * f * f + 1.0) - 1.0) / (np.sqrt(MU + 1.0) - 1.0)


def _latlon(x):
    phi = jnp.arcsin(jnp.clip(x[..., 2] / A, -1, 1))
    lam = jnp.arctan2(x[..., 1], x[..., 0])
    return lam, phi


def _torr(r):
    Acoef = 1.0 / GAMMA
    B = (TE - TP) / ((TE + TP) * TP)
    C = 0.5 * (KP + 2.0) * (TE - TP) / (TE * TP)
    H = RD * T0 / GRAVITY
    fac = (r - A) / (2.0 * H)
    fac2 = fac * fac
    t1 = (Acoef * GAMMA / T0) * jnp.exp(GAMMA * (r - A) / T0) \
        + B * (1.0 - 2.0 * fac2) * jnp.exp(-fac2)
    t2 = C * (1.0 - 2.0 * fac2) * jnp.exp(-fac2)
    i1 = Acoef * (jnp.exp(GAMMA * (r - A) / T0) - 1.0) \
        + B * (r - A) * jnp.exp(-fac2)
    i2 = C * (r - A) * jnp.exp(-fac2)
    return t1, t2, i1, i2


def temp(phi, r):
    t1, t2, _, _ = _torr(r)
    cp_ = jnp.cos(phi)
    fac = cp_ ** KP - (KP / (KP + 2.0)) * cp_ ** (KP + 2.0)
    return 1.0 / (t1 - t2 * fac)


def pres(phi, r):
    _, _, i1, i2 = _torr(r)
    cp_ = jnp.cos(phi)
    fac = cp_ ** KP - (KP / (KP + 2.0)) * cp_ ** (KP + 2.0)
    return P0 * jnp.exp(-GRAVITY * i1 / RD + GRAVITY * i2 * fac / RD)


def u_mean(phi, r):
    cp_ = jnp.cos(phi)
    _, _, _, i2 = _torr(r)
    T = temp(phi, r)
    U = (GRAVITY * KP / A) * i2 * (cp_ ** (KP - 1.0) - cp_ ** (KP + 1.0)) * T
    oc = OMEGA * A * cp_
    return -oc + jnp.sqrt(oc * oc + A * cp_ * U)


def z_taper(z):
    f = z / ZT
    return jnp.where(z > ZT, 0.0, 1.0 - 3.0 * f * f + 2.0 * f ** 3)


def _pert(x, z):
    lam, phi = _latlon(x)
    arg = jnp.clip(jnp.sin(PHI_C) * jnp.sin(phi)
                   + jnp.cos(PHI_C) * jnp.cos(phi) * jnp.cos(lam - LAMBDA_C),
                   -1.0, 1.0)
    gc = A * jnp.arccos(arg)
    th = 0.5 * jnp.pi * gc / D0
    ct, st = jnp.cos(th), jnp.sin(th)
    amp = 16.0 * VP * z_taper(z) / (3.0 * np.sqrt(3.0)) * ct ** 3 * st
    sgc = jnp.sin(gc / A)
    safe = (gc > 1e-4) & (gc < A * np.pi - 1e-4) & (gc <= D0)
    inv = jnp.where(safe, 1.0 / jnp.where(safe, sgc, 1.0), 0.0)
    fac_u = -jnp.sin(PHI_C) * jnp.cos(phi) \
        + jnp.cos(PHI_C) * jnp.sin(phi) * jnp.cos(lam - LAMBDA_C)
    fac_v = jnp.cos(PHI_C) * jnp.sin(lam - LAMBDA_C)
    return -amp * fac_u * inv, +amp * fac_v * inv


def build(ne: int = 8, p: int = 3, nk: int = 30, dt: float = 75.0, dtype=None,
          el_sharding=None, do_visc: bool = True, topog=None, **kw):
    # top Rayleigh sponge on by default: #define RAYLEIGH (4.0/120.0) is
    # active in the reference vertical solve (eul/VertSolve.cpp:32) and the
    # 12-day run is unstable without it (lid reflections, blowup ~day 3)
    kw.setdefault('rayleigh', 4.0 / 120.0)
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mesh = cubed_sphere_mesh(ne, radius=A)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype, el_sharding=el_sharding)
    zl = z_levels(nk)
    if topog is not None:
        # terrain-following stretched levels (Geom::initTopog hook,
        # eul/UMJS14.cpp:294, eul/Geom.cpp:743-761)
        ll = np.asarray(geom.lonlat)
        levs = terrain_following_levels(zl, np.asarray(topog(ll[..., 0],
                                                             ll[..., 1])))
    else:
        levs = zl[:, None, None] * np.ones((1, ops.nel, basis.nq))
    vo = VerticalOps(ops, levs)
    coriolis = lambda lon, lat: 2.0 * OMEGA * jnp.sin(lat)
    eul = Euler3D(ops, vo, dt=dt, coriolis=coriolis, do_visc=do_visc, **kw)

    def rho_f(x, z):
        lam, phi = _latlon(x)
        return pres(phi, z + A) / (RD * temp(phi, z + A))

    def theta_f(x, z):
        lam, phi = _latlon(x)
        return temp(phi, z + A) * (P0 / pres(phi, z + A)) ** (RD / CP)

    def rt_f(x, z):
        return rho_f(x, z) * theta_f(x, z)

    def pi_f(x, z):
        lam, phi = _latlon(x)
        return CP * (pres(phi, z + A) / P0) ** (RD / CP)

    rho = eul.project_layers(rho_f)
    rt = eul.project_layers(rt_f)
    exner = eul.project_layers(pi_f)

    def fu(x, z):
        lam, phi = _latlon(x)
        return u_mean(phi, z + A) + _pert(x, z)[0]

    def fv(x, z):
        return _pert(x, z)[1]

    velx = eul.project_velx(fu, fv)
    w = jnp.zeros((nk - 1, ops.nel, p * p), dtype)
    # the production path is the entropy-conserving Strang_ec scheme
    # (eul/UMJS14.cpp drives Euler::Strang_ec, eul/Euler_2.cpp:1366);
    # step with eul.step_ec
    return eul, eul.init_state_ec(velx, w, rho, rt, exner)
