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
