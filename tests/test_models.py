"""Model-level conservation regressions: advection, thermal SW, Rosenbrock."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mimsem_tpu.utils import diagnostics as dg


@pytest.mark.smoke
def test_advection_mass_conservation():
    from mimsem_tpu.testcases import solid_body
    adv, u, h = solid_body.build(ne=2, p=3)
    m0 = float(dg.int2(adv.ops, h))
    h1 = adv.step(h, u)
    h1 = adv.step(h1, u)
    m1 = float(dg.int2(adv.ops, h1))
    assert abs((m1 - m0) / m0) < 1e-12


def test_thermal_sw_conservation():
    from mimsem_tpu.testcases import thermo_geo
    tsw, u, h, S = thermo_geo.build(ne=2, p=3)
    c0 = {k: float(v) for k, v in tsw.conservation(u, h, S).items()}
    u1, h1, S1 = tsw.step(u, h, S)
    c1 = {k: float(v) for k, v in tsw.conservation(u1, h1, S1).items()}
    # mass and buoyancy exact; energy drift small for one SSP-RK3 step
    assert abs((c1['mass'] - c0['mass']) / c0['mass']) < 1e-12
    # buoyancy conserved to inner-solver tolerance (CG at 1e-13 inside the
    # flux diagnostics accumulates to ~1e-11 relative)
    assert abs((c1['buoy'] - c0['buoy']) / c0['buoy']) < 1e-9
    assert abs((c1['ener'] - c0['ener']) / c0['ener']) < 1e-6


def test_rosenbrock_w2_steady():
    from mimsem_tpu.testcases import williamson2 as w2
    from mimsem_tpu.models.swe_rosenbrock import SWEqnRosenbrock
    from mimsem_tpu.basis import make_basis
    from mimsem_tpu.mesh.cubed_sphere import cubed_sphere_mesh
    from mimsem_tpu.mesh.topology import build_topology
    from mimsem_tpu.mesh.geometry import build_geometry
    from mimsem_tpu.ops.local_form import LocalOps

    mesh = cubed_sphere_mesh(2)
    topo = build_topology(mesh, 3)
    basis = make_basis(3)
    geom = build_geometry(mesh, basis)
    ops = LocalOps(topo, basis, geom, mesh)
    sw = SWEqnRosenbrock(ops, dt=300.0, grav=w2.GRAV, omega=w2.OMEGA,
                         coriolis=w2.coriolis, h_base=w2.H0)
    u = ops.proj1(w2.u_init, w2.v_init, tol=1e-13)
    hp = ops.proj2(lambda lon, lat: w2.h_init(lon, lat) - w2.H0)
    hp_ana = lambda lon, lat: w2.h_init(lon, lat) - w2.H0
    n0 = dg.err2(ops, hp, hp_ana, mag=w2.h_init)
    uj, hj = sw.step(u, hp)
    n1 = dg.err2(ops, hj, hp_ana, mag=w2.h_init)
    # steady state preserved at truncation level
    assert float(n1[1]) < 3.0 * float(n0[1]) + 1e-6


def _w2_ops(ne=2, p=3):
    from mimsem_tpu.basis import make_basis
    from mimsem_tpu.mesh.cubed_sphere import cubed_sphere_mesh
    from mimsem_tpu.mesh.topology import build_topology
    from mimsem_tpu.mesh.geometry import build_geometry
    from mimsem_tpu.ops.local_form import LocalOps
    mesh = cubed_sphere_mesh(ne)
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    return LocalOps(topo, basis, geom, mesh)


def test_thermal_sw_v1_both_integrators():
    """ThermalSW v1 (u, h, s) capability (src/ThermalSW.{h,cpp}): the
    semi-implicit Picard and SSP-RK2 integrators both conserve mass exactly
    and keep energy/buoyancy drift small on the thermogeostrophic state."""
    from mimsem_tpu.models.thermal_swe import ThermalSWv1
    from mimsem_tpu.testcases import thermo_geo as tg

    ops = _w2_ops(ne=2, p=3)
    u0 = ops.proj1(tg.u_init, lambda lon, lat: 0.0 * lon, tol=1e-13)
    h0 = ops.proj2(tg.h_init)
    s0 = ops.proj2(tg.s_init)
    for integ in ("si", "rk2"):
        tsw = ThermalSWv1(ops, dt=30.0, omega=tg.OMEGA, hmean=tg.H0)
        c0 = {k: float(v) for k, v in tsw.conservation(u0, h0, s0).items()}
        u, h, s = u0, h0, s0
        for _ in range(4):
            u, h, s = tsw.solve(u, h, s) if integ == "si" \
                else tsw.step_rk2(u, h, s)
        c1 = {k: float(v) for k, v in tsw.conservation(u, h, s).items()}
        assert np.isfinite(np.asarray(u)).all(), integ
        assert abs((c1["mass"] - c0["mass"]) / c0["mass"]) < 1e-12, integ
        assert abs((c1["buoy"] - c0["buoy"]) / c0["buoy"]) < 1e-5, integ
        assert abs((c1["ener"] - c0["ener"]) / c0["ener"]) < 1e-5, integ


def test_rosenbrock_cn_w2_steady():
    """Crank-Nicolson alternative of the Rosenbrock solver (solve_cn,
    src/SWEqn_Rosenbrock.cpp:814-880): steady W2 stays steady, mass exact."""
    from mimsem_tpu.testcases import williamson2 as w2
    from mimsem_tpu.models.swe_rosenbrock import SWEqnRosenbrock

    ops = _w2_ops(ne=2, p=3)
    sw = SWEqnRosenbrock(ops, dt=300.0, grav=w2.GRAV, omega=w2.OMEGA,
                         coriolis=w2.coriolis, h_base=w2.H0, cn=True)
    u = ops.proj1(w2.u_init, w2.v_init, tol=1e-13)
    hp = ops.proj2(lambda lon, lat: w2.h_init(lon, lat) - w2.H0)
    n0 = w2.error_norms(sw, u, hp)
    c0 = sw.conservation(u, hp)
    for _ in range(3):
        u, hp = sw.step(u, hp)
    n1 = w2.error_norms(sw, u, hp)
    c1 = sw.conservation(u, hp)
    assert float(n1["h"][1]) < 3.0 * float(n0["h"][1]) + 1e-6
    assert abs(float((c1["mass"] - c0["mass"]) / c0["mass"])) < 1e-12


def test_swe_supg_pv_scheme():
    """The SUPG-anticipated PV rotational variant (q_supg;
    RotMat_up::assemble_supg, src/Assembly.cpp:1854-1926, wired as the
    reference's UP_APVM residual branch, src/SWEqn_Picard.cpp:487-510):
    pointwise q* = q - tau (u x grad q + dq/dt) in the same antisymmetric
    pairing.  On the W2 steady state it must hold the state as well as the
    other PV schemes (drift at the discretization level, not growing)."""
    import jax
    from mimsem_tpu.testcases import williamson2 as w2
    sw, u, h = w2.build(ne=4, p=3, dt=600.0, dtype=jnp.float64,
                        q_exact=False, q_supg=True)
    assert sw.q_supg and not sw.q_exact
    u1, h1 = jax.jit(lambda a, b: sw.run_steps(a, b, 3))(u, h)
    assert bool(jnp.isfinite(u1).all() and jnp.isfinite(h1).all())
    du = float(jnp.linalg.norm(u1 - u) / jnp.linalg.norm(u))
    assert du < 1e-3, du
