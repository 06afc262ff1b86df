import numpy as np
import pytest
import jax.numpy as jnp

from mimsem_tpu.basis import make_basis
from mimsem_tpu.mesh.cubed_sphere import cubed_sphere_mesh, RAD_SPHERE
from mimsem_tpu.mesh.box import periodic_box_mesh
from mimsem_tpu.mesh.topology import build_topology
from mimsem_tpu.mesh.geometry import build_geometry
from mimsem_tpu.ops.forms import SpaceOps


@pytest.mark.smoke
@pytest.mark.parametrize("ne,p", [(2, 3), (3, 2), (2, 1)])
def test_cubed_sphere_dof_counts(ne, p):
    """Global counts must match the reference closed forms (src/Topo.cpp:112-114):
    n0 = 6N^2+2, n1 = 2*6N^2, n2 = 6N^2 with N = p*ne per face edge."""
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    N = p * ne
    assert topo.n0 == 6 * N * N + 2
    assert topo.n1 == 2 * 6 * N * N
    assert topo.n2 == 6 * N * N


@pytest.mark.smoke
def test_box_dof_counts():
    mesh = periodic_box_mesh(3)
    p = 2
    topo = build_topology(mesh, p)
    N2 = (3 * p) ** 2
    assert topo.n0 == N2
    assert topo.n1 == 2 * N2
    assert topo.n2 == N2


@pytest.mark.parametrize("mesh_fn", [lambda: cubed_sphere_mesh(2),
                                     lambda: periodic_box_mesh(3)])
@pytest.mark.smoke
def test_incidence_exactness(mesh_fn):
    """E21 . E10 == 0 identically (discrete div curl = 0), the core mimetic
    property; and E10/E21 consistency of owner-based rows."""
    mesh = mesh_fn()
    p = 3
    topo = build_topology(mesh, p)
    b = make_basis(p)
    geom = build_geometry(mesh, b)
    ops = SpaceOps(topo, b, geom)
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal(topo.n0))
    div_curl = ops.e21(ops.e10(psi))
    assert float(jnp.max(jnp.abs(div_curl))) < 1e-11


def test_sphere_area_from_jacobians():
    mesh = cubed_sphere_mesh(4)
    b = make_basis(3)
    geom = build_geometry(mesh, b)
    area = float(np.sum(geom.det * b.W[None, :]))
    exact = 4 * np.pi * RAD_SPHERE ** 2
    assert abs(area - exact) / exact < 1e-5


def test_box_area_and_affine_jacobian():
    mesh = periodic_box_mesh(4, lx=1000.0)
    b = make_basis(3)
    geom = build_geometry(mesh, b)
    np.testing.assert_allclose(geom.J[..., 0, 0], 0.5 * 1000.0 / 4, atol=1e-10)
    np.testing.assert_allclose(geom.J[..., 0, 1], 0.0, atol=1e-10)
    area = float(np.sum(geom.det * b.W[None, :]))
    assert abs(area - 1000.0 ** 2) < 1e-6


def test_mass_matrices_spd():
    mesh = cubed_sphere_mesh(2)
    p = 3
    topo = build_topology(mesh, p)
    b = make_basis(p)
    geom = build_geometry(mesh, b)
    ops = SpaceOps(topo, b, geom)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(topo.n1))
    v = jnp.asarray(rng.standard_normal(topo.n1))
    # symmetry  <M1 u, v> == <u, M1 v>
    a = float(jnp.vdot(ops.apply_M1(u), v))
    c = float(jnp.vdot(u, ops.apply_M1(v)))
    assert abs(a - c) < 1e-6 * abs(a)
    # positivity
    assert float(jnp.vdot(ops.apply_M1(u), u)) > 0
    assert float(jnp.vdot(ops.apply_M0(jnp.asarray(rng.standard_normal(topo.n0))[...],),
                          jnp.ones(topo.n0))) != 0


def test_adjoint_incidence():
    """e01 == -e10^T and e12 == -e21^T as bilinear identities."""
    mesh = cubed_sphere_mesh(2)
    topo = build_topology(mesh, 2)
    b = make_basis(2)
    geom = build_geometry(mesh, b)
    ops = SpaceOps(topo, b, geom)
    rng = np.random.default_rng(2)
    psi = jnp.asarray(rng.standard_normal(topo.n0))
    w1 = jnp.asarray(rng.standard_normal(topo.n1))
    h2 = jnp.asarray(rng.standard_normal(topo.n2))
    u1 = jnp.asarray(rng.standard_normal(topo.n1))
    assert abs(float(jnp.vdot(ops.e10(psi), w1) + jnp.vdot(psi, ops.e01(w1)))) < 1e-9
    assert abs(float(jnp.vdot(ops.e21(u1), h2) + jnp.vdot(u1, ops.e12(h2)))) < 1e-9
