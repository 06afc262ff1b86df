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
