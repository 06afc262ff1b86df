"""3D Euler vertical-solve correctness (fast, eager-mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mimsem_tpu.testcases import bubble


@pytest.fixture(scope="module")
def hydro():
    eul, state = bubble.build(ne=2, p=2, nk=5, dt=0.5)
    velx, w, rho, rt, exner, _ = state
    rt0 = eul.project_layers(lambda x, z: bubble.rho_init(x, z) * bubble.THETA_0)
    pi0 = eul.project_layers(bubble.exner_init)
    return eul, w, rho, rt0, pi0


def test_vertical_hydrostatic_balance(hydro):
    """Isentropic hydrostatic column is a discrete steady state of the vertical
    implicit solve: w stays at machine zero, Pi/rho unchanged (the analogue of
    the reference's 1e-12 Newton convergence, box/VertSolve.cpp:1405-1418)."""
    eul, w, rho, rt0, pi0 = hydro
    z = jnp.zeros_like(rho)
    dFx_fn = lambda rho_j: (z, z, None)
    with jax.disable_jit():
        w1, rho1, rt1, pi1 = eul.vert_solve(w, rho, rt0, pi0, dFx_fn, None)
    assert float(jnp.abs(eul.vo.phys_int(w1)).max()) < 1e-9
    assert float(jnp.abs(eul.vo.phys_layer(pi1 - pi0)).max()) < 1e-10 * 900.0
    assert float(jnp.abs(eul.vo.phys_layer(rho1 - rho)).max()) < 1e-10


def test_eos_consistency(hydro):
    eul, w, rho, rt0, pi0 = hydro
    with jax.disable_jit():
        res = eul.vo.eos_residual(rt0, eul.vo.eos_exner(rt0))
    assert float(jnp.abs(res).max()) < 1e-12


def test_buoyant_anomaly_accelerates_upward(hydro):
    """A warm anomaly must produce positive w under the implicit solve."""
    eul, w, rho, rt0, pi0 = hydro
    vo = eul.vo
    # +1 K theta anomaly in the middle of the column, uniform horizontally
    rt_pert = eul.project_layers(
        lambda x, z: bubble.rho_init(x, z)
        * (bubble.THETA_0 + jnp.where(jnp.abs(z - 450.0) < 200.0, 1.0, 0.0)))
    zfield = jnp.zeros_like(rho)
    dFx_fn = lambda rho_j: (zfield, zfield, None)
    with jax.disable_jit():
        w1, rho1, rt1, pi1 = eul.vert_solve(w, rho, rt_pert, pi0, dFx_fn, None)
    wq = np.asarray(vo.phys_int(w1))
    assert wq.max() > 1e-4          # rises
    assert wq.max() < 10.0          # but does not blow up
