"""Williamson test case 2: steady zonal flow on a rotated axis.

Reference: src/Williamson2.cpp (constants :20-27, ICs :35-61); Williamson,
Drake, Hack, Jakob and Swartzrauber, JCP 102 (1992).  The flow is an exact
steady solution -- L1/L2/Linf error norms against the ICs measure convergence.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..basis import make_basis
from ..mesh.cubed_sphere import cubed_sphere_mesh, RAD_SPHERE
from ..mesh.topology import build_topology
from ..mesh.geometry import build_geometry
from ..ops.forms import SpaceOps
from ..ops.local_form import LocalOps
from ..models.swe import SWEqn
from ..utils import diagnostics as dg

GRAV = 9.80616
OMEGA = 7.292e-5
U0 = 38.61068276698372
H0 = 2998.1154702758267
ALPHA = 0.25 * jnp.pi


def w_init(lon, lat):
    return (2.0 * U0 / RAD_SPHERE + 2.0 * OMEGA) * (
        -jnp.cos(lon) * jnp.cos(lat) * jnp.sin(ALPHA) + jnp.sin(lat) * jnp.cos(ALPHA))


def u_init(lon, lat):
    return U0 * (jnp.cos(lat) * jnp.cos(ALPHA)
                 + jnp.cos(lon) * jnp.sin(lat) * jnp.sin(ALPHA))


def v_init(lon, lat):
    return -U0 * jnp.sin(lon) * jnp.sin(ALPHA)


def h_init(lon, lat):
    b = -jnp.cos(lon) * jnp.cos(lat) * jnp.sin(ALPHA) + jnp.sin(lat) * jnp.cos(ALPHA)
    return H0 - (RAD_SPHERE * OMEGA * U0 + 0.5 * U0 * U0) * b * b / GRAV


def coriolis(lon, lat):
    """Rotated-axis Coriolis (src/SWEqn_Picard.cpp:206-207 with W2_ALPHA)."""
    return 2.0 * OMEGA * (-jnp.cos(lon) * jnp.cos(lat) * jnp.sin(ALPHA)
                          + jnp.sin(lat) * jnp.cos(ALPHA))


def build(ne: int, p: int = 3, dt: float = 600.0, dtype=None, el_sharding=None, **kw):
    import jax.numpy as _jnp
    if dtype is None:
        dtype = _jnp.float64 if jax.config.jax_enable_x64 else _jnp.float32
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh, dtype=dtype, el_sharding=el_sharding)
    kw.setdefault('q_exact', True)
    kw.setdefault('nits', 4)
    kw.setdefault('h_base', H0)
    sw = SWEqn(ops, dt=dt, grav=GRAV, omega=OMEGA, coriolis=coriolis, **kw)
    u = ops.proj1(u_init, v_init, tol=1e-13 if dtype == _jnp.float64 else 1e-6)
    hp = ops.proj2(lambda lon, lat: h_init(lon, lat) - H0)
    return sw, u, hp


def error_norms(sw: SWEqn, u, hp):
    """Relative L1/L2/Linf of (w, u, h) vs the steady solution
    (src/Williamson2.cpp:139-151)."""
    ops = sw.ops
    # absolute vorticity (relative curl + planetary) vs the analytic w_init
    w = sw.curl(u) + sw.f0
    return dict(
        w=dg.err0(ops, w, w_init),
        u=dg.err1(ops, u, u_init, v_init),
        h=dg.err2(ops, hp, lambda lon, lat: h_init(lon, lat) - H0,
                  lat_cap=0.45 * jnp.pi, mag=h_init),
    )
