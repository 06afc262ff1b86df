"""Williamson2 steady-state + conservation regression (SURVEY.md section 4 tiers 1-2)."""
import numpy as np
import pytest
import jax.numpy as jnp

from mimsem_tpu.testcases import williamson2 as w2


@pytest.fixture(scope="module")
def w2_run():
    sw, u, h = w2.build(ne=3, p=3, dt=600.0)
    c0 = sw.conservation(u, h)
    n0 = w2.error_norms(sw, u, h)
    uj, hj = u, h
    for _ in range(3):
        uj, hj = sw.step(uj, hj)
    return sw, u, h, uj, hj, c0, n0


def test_w2_steady_state_error(w2_run):
    sw, u, h, uj, hj, c0, n0 = w2_run
    n1 = w2.error_norms(sw, uj, hj)
    # steady solution: error after 3 steps stays at the truncation level
    assert float(n1['h'][1]) < 3.0 * float(n0['h'][1]) + 1e-6
    assert float(n1['u'][1]) < 3.0 * float(n0['u'][1]) + 1e-6


def test_w2_mass_conservation_exact(w2_run):
    sw, u, h, uj, hj, c0, n0 = w2_run
    c1 = sw.conservation(uj, hj)
    assert abs(float((c1['mass'] - c0['mass']) / c0['mass'])) < 1e-13


def test_w2_energy_conservation(w2_run):
    sw, u, h, uj, hj, c0, n0 = w2_run
    c1 = sw.conservation(uj, hj)
    # energy-conserving scheme: drift at solver tolerance per step
    assert abs(float((c1['ener'] - c0['ener']) / c0['ener'])) < 1e-7


def test_w2_vorticity_conservation(w2_run):
    sw, u, h, uj, hj, c0, n0 = w2_run
    c1 = sw.conservation(uj, hj)
    # total vorticity integral is conserved (and ~0 on the sphere)
    scale = abs(float(c0['enst'])) ** 0.5 + 1.0
    assert abs(float(c1['vort'] - c0['vort'])) < 1e-6 * scale


def test_kahan_compensation_survives_jit():
    """XLA must not algebraically fold the compensated-summation correction."""
    import jax
    from mimsem_tpu.models.swe import kahan_add

    def comp(x, n):
        def body(c, _):
            return kahan_add(c[0], c[1], jnp.float32(1e-4)), None
        return jax.lax.scan(body, (x, jnp.float32(0)), None, length=n)[0]

    n = 100000
    xk, ek = jax.jit(comp, static_argnums=1)(jnp.float32(1e4), n)
    true = 1e4 + 1e-4 * n
    assert abs(float(xk) - float(ek) - true) < 1e-2


def test_w2_f32_drift_quality():
    """Production mixed-precision path: perturbation state + f64 balanced
    forcing + Kahan accumulation keeps f32 drift near f64 quality
    (reference exactness property, src/SWEqn_Picard.cpp:1342-1354)."""
    sw, u, hp = w2.build(ne=3, p=3, dt=600.0, dtype=jnp.float32)
    c0 = sw.conservation_f64(u, hp)
    cu, ch = jnp.zeros_like(u), jnp.zeros_like(hp)
    for _ in range(10):
        u, hp, cu, ch = sw._step_k(u, hp, cu, ch)
    c1 = sw.conservation_f64(u, hp, cu, ch)
    assert abs((c1['mass'] - c0['mass']) / c0['mass']) < 1e-8
    assert abs((c1['ener'] - c0['ener']) / c0['ener']) < 1e-7


def test_w2_q_block_pv_solve():
    """Exact-enstrophy block PV solve (diagnose_q_exact,
    src/SWEqn_Picard.cpp:1361-1478).  Sharp algebraic oracles:

    (a) symmetric-state reduction: with ui=uj, hi=hj the 2x2 block system
        [M0h(2h/3) M0h(h/3); M0h(h/3) M0h(2h/3)] qi,qj = r,r collapses to the
        standard consistent-mass PV equation M0h(h) q = E01 M1 u + M0 f, so
        diagnose_q_block must equal diagnose_q exactly (colocated GLL makes
        the 0-form mass exactly diagonal, so 'lumped' IS consistent);
    (b) the pointwise 2x2 elimination must agree with the block-CG fallback
        path (two independent solution routes through the same system);
    (c) the solver that uses it keeps mass/energy at tolerance on W2.
    (Enstrophy DRIFT on near-steady W2 is truncation-dominated and identical
    for midpoint and block PV -- measured 3.567e-7 both -- so drift cannot
    discriminate the modes; the block system itself is the verifiable
    contract.)"""
    sw, u, h = w2.build(ne=2, p=3, dt=600.0, q_block=True)
    ops = sw.ops
    hq = sw._hq(h)

    # (a) symmetric reduction
    qb = sw.diagnose_q_block(u, u, hq, hq)
    qs, _ = sw.diagnose_q(u, hq, upwind=False)
    nrm = float(jnp.abs(qs).max())
    assert float(jnp.abs(qb - qs).max()) < 1e-12 * nrm

    # (b) pointwise 2x2 vs block-CG on an asymmetric state pair
    u2, h2 = sw.step(u, h)
    hq2 = sw._hq(h2)
    q_point = sw.diagnose_q_block(u, u2, hq, hq2)
    assert ops.m0_diag_exact
    try:
        ops.m0_diag_exact = False
        q_cg = sw.diagnose_q_block(u, u2, hq, hq2)
    finally:
        ops.m0_diag_exact = True
    assert float(jnp.abs(q_point - q_cg).max()) < 1e-9 * nrm

    # (c) solver-level conservation with the block PV active
    c0 = sw.conservation(u, h)
    uj, hj = u, h
    for _ in range(4):
        uj, hj = sw.step(uj, hj)
    c1 = sw.conservation(uj, hj)
    assert abs(float((c1["mass"] - c0["mass"]) / c0["mass"])) < 1e-12
    assert abs(float((c1["ener"] - c0["ener"]) / c0["ener"])) < 1e-7
