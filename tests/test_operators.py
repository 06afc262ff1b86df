"""Operator accuracy vs analytic fields on the unit-ish sphere.

TPU-native rebuild of the reference's deprecated operator test drivers
(dep/sandbox/src/TestGradient/TestDivergence/TestVorticity/TestK.cpp).
These exercise cross-panel 1-form orientation: any sign error at a cube-face
boundary shows up as O(1) error in the projected/derived fields.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from mimsem_tpu.basis import make_basis
from mimsem_tpu.mesh.cubed_sphere import cubed_sphere_mesh, RAD_SPHERE
from mimsem_tpu.mesh.topology import build_topology
from mimsem_tpu.mesh.geometry import build_geometry
from mimsem_tpu.ops.forms import SpaceOps
from mimsem_tpu.utils import diagnostics as dg

U0 = 40.0
R = RAD_SPHERE


def setup(ne, p):
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    b = make_basis(p)
    geom = build_geometry(mesh, b)
    return SpaceOps(topo, b, geom)


# solid body rotation: u = U0 cos(lat), psi = -U0 R sin(lat), zeta = 2 U0 sin(lat)/R
psi_f = lambda lon, lat: -U0 * R * jnp.sin(lat)
u_f = lambda lon, lat: U0 * jnp.cos(lat)
v_f = lambda lon, lat: jnp.zeros_like(lon)
zeta_f = lambda lon, lat: 2.0 * U0 * jnp.sin(lat) / R
h_f = lambda lon, lat: 1e4 + 100.0 * jnp.cos(lat) * jnp.cos(2 * lon)


def test_projection_0form_accuracy():
    ops = setup(3, 3)
    q0 = ops.proj0(psi_f)
    n = dg.err0(ops, q0, psi_f)
    assert float(n[1]) < 1e-4


@pytest.mark.smoke
def test_projection_2form_accuracy():
    """2-form coefficients absorb det(J), so even constants converge at O(h^p)
    on the curved sphere (same property as the reference's W2 space); check
    level and order rather than machine accuracy."""
    errs = []
    for ne in (2, 4):
        ops = setup(ne, 3)
        h2 = ops.proj2(h_f)
        errs.append(float(dg.err2(ops, h2, h_f)[1]))
    assert errs[1] < 2e-3
    order = np.log2(errs[0] / errs[1])
    assert order > 2.5, (errs, order)


def test_projection_1form_accuracy():
    """Catches cross-panel sign errors: a wrong sign makes the error O(1)."""
    ops = setup(3, 3)
    u1 = ops.proj1(u_f, v_f)
    n = dg.err1(ops, u1, u_f, v_f)
    # O(h^p) metric truncation (Piola space can't represent u exactly on the
    # curved sphere); a cross-panel sign error would be O(1) instead.
    assert float(n[1]) < 1e-2


def test_rotated_gradient_of_streamfunction():
    """u_h = E10 psi_h reproduces the solid-body velocity (TestGradient analogue)."""
    ops = setup(3, 3)
    psi0 = ops.proj0(psi_f)
    u1 = ops.e10(psi0)
    n = dg.err1(ops, u1, u_f, v_f)
    assert float(n[1]) < 2e-2
    # and is exactly divergence free
    div = ops.e21(u1)
    assert float(jnp.max(jnp.abs(div))) < 1e-8 * float(jnp.max(jnp.abs(u1)))


def test_weak_curl_vorticity():
    """w = M0^-1 E01 M1 u reproduces zeta = 2 U0 sin(lat)/R (TestVorticity)."""
    ops = setup(3, 3)
    u1 = ops.proj1(u_f, v_f, tol=1e-13)
    w0 = ops.solve_M0(ops.e01(ops.apply_M1(u1)))
    n = dg.err0(ops, w0, zeta_f)
    assert float(n[1]) < 2e-2


@pytest.mark.smoke
def test_weak_divergence_small():
    ops = setup(3, 3)
    u1 = ops.proj1(u_f, v_f, tol=1e-13)
    div = ops.e21(u1)  # 2-form coefficients of div
    # physical divergence values
    dq = ops.interp2_phys(div)
    scale = U0 / R
    # truncation-level: the L2 projection is not discretely div-free
    assert float(jnp.max(jnp.abs(dq))) < 0.1 * scale


def test_kinetic_energy_operator():
    """<1, K(u) u> = integral of 0.5 h... with test fn 1: total KE of solid body.

    Exact: int 0.5 U0^2 cos^2(lat) dA = 0.5 U0^2 * (8/3) pi R^2 (TestK analogue).
    """
    ops = setup(3, 3)
    u1 = ops.proj1(u_f, v_f, tol=1e-13)
    k2 = ops.apply_K(u1, u1)
    # <K u, M2^-1 ...>: integral of the 2-form K against constant 1 test fn:
    # sum of coefficients of K weighted... use int2 of M2^-1 K
    ke2 = ops.solve_M2(k2)
    total = float(dg.int2(ops, ke2))
    exact = 0.5 * U0 ** 2 * (8.0 / 3.0) * np.pi * R ** 2
    assert abs(total - exact) / exact < 1e-4


def test_convergence_with_resolution():
    """L2 error of 1-form projection decreases with mesh refinement at high order."""
    errs = []
    for ne in (2, 4):
        ops = setup(ne, 3)
        u1 = ops.proj1(u_f, v_f, tol=1e-13)
        errs.append(float(dg.err1(ops, u1, u_f, v_f)[1]))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.5, (errs, order)


def test_coriolis_projection_exact_enough():
    ops = setup(2, 3)
    omega = 7.292e-5
    f_f = lambda lon, lat: 2 * omega * jnp.sin(lat)
    f0 = ops.proj0(f_f)
    n = dg.err0(ops, f0, f_f)
    assert float(n[1]) < 1e-3


def test_m1_up_tau0_is_m1():
    """The upwinded-TEST-function 1-form mass (Umat::assemble_up,
    src/Assembly.cpp:127-245) must reduce to the centred (field-weighted)
    mass exactly at tau=0, and its departure-point tensors must equal the
    static tables."""
    ops = setup(2, 3)
    u1 = ops.proj1(u_f, v_f, tol=1e-13)
    h2 = ops.proj2(h_f)
    Bx, By = ops.m1_up(u1, 0.0)
    assert np.allclose(np.asarray(Bx), np.asarray(ops.B1x)[None], atol=1e-14)
    assert np.allclose(np.asarray(By), np.asarray(ops.B1y)[None], atol=1e-14)
    a = np.asarray(ops.apply_M1h_up(u1, Bx, By, h2=h2))
    b = np.asarray(ops.apply_M1(u1, h2=h2))
    assert np.allclose(a, b, rtol=1e-13, atol=1e-9 * np.abs(b).max())


def test_m1_up_consistency_small_tau():
    """For small tau the upwinded operator is an O(tau) perturbation of M1
    that still integrates constants exactly on the trial side: row sums
    against a projected constant field change only at O(tau) * |u|."""
    ops = setup(2, 3)
    u1 = ops.proj1(u_f, v_f, tol=1e-13)
    tau = 1e-3
    Bx, By = ops.m1_up(u1, tau)
    a = np.asarray(ops.apply_M1h_up(u1, Bx, By))
    b = np.asarray(ops.apply_M1(u1))
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert 0.0 < rel < 0.1, rel
    # nodal-basis partition of unity: sum_i l_i(x) = 1 at ANY evaluation
    # point, so the column sums over each x-family nodal index are
    # tau-independent
    nx = np.asarray(Bx).reshape(ops.nel, ops.B1x.shape[0], -1)
    np1 = ops.p + 1
    s = nx.reshape(nx.shape[0], nx.shape[1], -1, np1).sum(-1)
    s0 = np.asarray(ops.B1x).reshape(ops.B1x.shape[0], -1, np1).sum(-1)
    assert np.allclose(s, np.broadcast_to(s0, s.shape), atol=1e-12)


def test_supg_time_derivative_term():
    """apply_R_apvm with q_prev/dt adds the reference SUPG time-derivative
    correction (src/Assembly.cpp:1903): identical PV fields => identical to
    plain APVM; differing PV => differs by the tau*(q-q_prev)/dt rotation."""
    ops = setup(2, 3)
    u1 = ops.proj1(u_f, v_f, tol=1e-13)
    q0 = ops.proj0(zeta_f)
    dq1 = ops.e10(q0)
    tau, dt = 0.5, 600.0
    a = np.asarray(ops.apply_R_apvm(q0, u1, dq1, tau, u1))
    b = np.asarray(ops.apply_R_apvm(q0, u1, dq1, tau, u1, q_prev=q0, dt=dt))
    assert np.allclose(a, b, atol=1e-12 * max(1.0, np.abs(a).max()))
    # an O(q) PV tendency over one dt must shift the rotation by O(tau*q)
    qp = ops.proj0(lambda lon, lat: 2.0 * zeta_f(lon, lat))
    c = np.asarray(ops.apply_R_apvm(q0, u1, dq1, tau, u1, q_prev=qp, dt=1.0))
    rel = np.linalg.norm(a - c) / np.linalg.norm(a)
    assert rel > 0.05, rel


def test_discrete_leibniz_identity_quadrature_limited():
    """Structural identity behind enstrophy budgets (see DESIGN.md q_block):

        <g, E01 R(q) F> + <q, E01 R(g) F>  =  <g, M0(divF) q> + O(quad)

    the discrete analogue of  int g grad(q).F + q grad(g).F = -int g q divF
    (sign folded into this code's e01 = -E10^T convention).  It holds only
    to QUADRATURE accuracy for deg-p GLL (the triple product is degree
    3p+1), which is exactly why the trapezoidal q_block PV conserves energy
    but not enstrophy; the defect must converge out at high order.
    """
    def fields(ops):
        g = ops.proj0(lambda lon, lat:
                      jnp.sin(2 * lon) * jnp.cos(lat) ** 2
                      + 0.3 * jnp.sin(lat))
        q = ops.proj0(lambda lon, lat:
                      jnp.cos(3 * lon) * jnp.sin(lat) * jnp.cos(lat) + 0.1)
        F = ops.proj1(lambda lon, lat: jnp.cos(lat) * jnp.sin(lon + lat),
                      lambda lon, lat: jnp.sin(2 * lat) * jnp.cos(lon))
        return g, q, F

    def defect(ne):
        ops = setup(ne, 3)
        g, q, F = fields(ops)
        lhs = (ops.dot0(g, ops.e01(ops.apply_R(q, F)))
               + ops.dot0(q, ops.e01(ops.apply_R(g, F))))
        rhs = ops.dot0(g, ops.apply_M0(
            q, weight_q=ops.interp2_phys(ops.e21(F))))
        return abs(float(lhs - rhs)) / max(abs(float(lhs)),
                                           abs(float(rhs)))

    d3, d6 = defect(3), defect(6)
    # measured (f64): 1.77e-2 at ne=3 -> 2.58e-4 at ne=6 (~6th order)
    assert d3 < 0.05, d3
    assert d6 < d3 / 16.0, (d3, d6)


def test_concat_dss_bitexact():
    """The concat-form DSS cores (one fused output expression; perf
    formulation targeting the dynamic-update-slice cost, ROOFLINE.md) must
    be BIT-identical to the slicing cores on both mesh families."""
    import jax
    from mimsem_tpu.basis import make_basis
    from mimsem_tpu.mesh.cubed_sphere import cubed_sphere_mesh
    from mimsem_tpu.mesh.box import periodic_box_mesh
    from mimsem_tpu.mesh.topology import build_topology
    from mimsem_tpu.mesh.geometry import build_geometry
    from mimsem_tpu.ops.local_form import LocalOps
    p = 3
    for mesh_fn in (lambda: cubed_sphere_mesh(3), lambda: periodic_box_mesh(4)):
        mesh = mesh_fn()
        topo = build_topology(mesh, p)
        basis = make_basis(p)
        geom = build_geometry(mesh, basis)
        ops = LocalOps(topo, basis, geom, mesh, dtype=jnp.float32)
        k = jax.random.PRNGKey(1)
        v1 = jax.random.normal(k, (ops.nel, 2 * ops.n1loc), jnp.float32)
        v0 = jax.random.normal(k, (ops.nel, (p + 1) * (p + 1)), jnp.float32)
        assert bool((ops._dss1_core(v1) == ops._dss1_concat(v1)).all())
        assert bool((ops._dss0_core(v0) == ops._dss0_concat(v0)).all())
