"""LocalOps (structured-DSS local-form backend) vs SpaceOps (global-vector
backend) cross-validation: every operator must agree to machine precision.

The local-form backend removes all arbitrary-index gathers from the hot path
(slice-based in-face DSS + static cube-edge strip exchanges + vertex fixups);
this test pins its exact equivalence to the reference formulation.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mimsem_tpu.basis import make_basis
from mimsem_tpu.mesh.cubed_sphere import cubed_sphere_mesh
from mimsem_tpu.mesh.box import periodic_box_mesh
from mimsem_tpu.mesh.topology import build_topology
from mimsem_tpu.mesh.geometry import build_geometry
from mimsem_tpu.ops.forms import SpaceOps
from mimsem_tpu.ops.local_form import LocalOps


@pytest.fixture(params=["sphere", "box"])
def pair(request):
    mesh = cubed_sphere_mesh(2) if request.param == "sphere" else periodic_box_mesh(3)
    p = 3
    topo = build_topology(mesh, p)
    b = make_basis(p)
    geom = build_geometry(mesh, b)
    g = SpaceOps(topo, b, geom)
    l = LocalOps(topo, b, geom, mesh)
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.standard_normal(topo.n1))
    u0 = jnp.asarray(rng.standard_normal(topo.n0))
    h2 = jnp.asarray(rng.standard_normal(topo.n2))
    u1l = jnp.asarray((topo.sgn1 * np.asarray(u1)[topo.e2d1]).ravel())
    u0l = jnp.asarray(np.asarray(u0)[topo.e2d0].ravel())
    return topo, g, l, u0, u1, h2, u0l, u1l


def _cmp(topo, glob_vec, loc_vec, form, tol=1e-11):
    if form == 1:
        ref = (topo.sgn1 * np.asarray(glob_vec)[topo.e2d1]).ravel()
    elif form == 0:
        ref = np.asarray(glob_vec)[topo.e2d0].ravel()
    else:
        ref = np.asarray(glob_vec)
    err = np.max(np.abs(ref - np.asarray(loc_vec))) / (np.max(np.abs(ref)) + 1e-30)
    assert err < tol, err


def test_mass_ops_match(pair):
    topo, g, l, u0, u1, h2, u0l, u1l = pair
    with jax.disable_jit():
        _cmp(topo, g.apply_M1(u1), l.apply_M1(u1l), 1)
        _cmp(topo, g.apply_M1(u1, h2), l.apply_M1(u1l, h2), 1)
        _cmp(topo, g.apply_M0(u0), l.apply_M0(u0l), 0)
        _cmp(topo, g.apply_M2(h2), l.apply_M2(h2), 2)
        _cmp(topo, g.apply_R(u0, u1), l.apply_R(u0l, u1l), 1)
        _cmp(topo, g.apply_K(u1, u1), l.apply_K(u1l, u1l), 2)


def test_incidence_match(pair):
    topo, g, l, u0, u1, h2, u0l, u1l = pair
    with jax.disable_jit():
        _cmp(topo, g.e10(u0), l.e10(u0l), 1)
        _cmp(topo, g.e21(u1), l.e21(u1l), 2)
        _cmp(topo, g.e01(u1), l.e01(u1l), 0)
        _cmp(topo, g.e12(h2), l.e12(h2), 1)


def test_dots_and_solves_match(pair):
    topo, g, l, u0, u1, h2, u0l, u1l = pair
    with jax.disable_jit():
        d1 = float(g.dot1(g.apply_M1(u1), u1))
        d1l = float(l.dot1(l.apply_M1(u1l), u1l))
        assert abs(d1 - d1l) < 1e-12 * abs(d1)
        _cmp(topo, g.solve_M0(g.apply_M0(u0)), l.solve_M0(l.apply_M0(u0l)), 0)
        _cmp(topo, g.solve_M2(g.apply_M2(h2)), l.solve_M2(l.apply_M2(h2)), 2)


def test_dss_idempotent_on_consistent(pair):
    topo, g, l, u0, u1, h2, u0l, u1l = pair
    with jax.disable_jit():
        # consistent vector scaled by 1/mult then DSS'd returns itself
        v = np.asarray(u1l) * np.asarray(l.wdot1)
        out = l.dss1(jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(out), np.asarray(u1l), atol=1e-12,
                                   rtol=1e-12)
        v0 = np.asarray(u0l) * np.asarray(l.wdot0)
        out0 = l.dss0(jnp.asarray(v0))
        np.testing.assert_allclose(np.asarray(out0), np.asarray(u0l), atol=1e-12,
                                   rtol=1e-12)
