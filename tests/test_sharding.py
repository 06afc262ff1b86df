"""Multi-device sharding equivalence (the analogue of the reference's
'mpirun -np 6 on one box' distributed test, SURVEY.md section 4).

Runs on the 8 virtual CPU devices set up in conftest.py: the element-sharded
model must reproduce the single-device result.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mimsem_tpu.parallel.sharding import make_mesh, element_sharding


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_advection_matches_single_device():
    from mimsem_tpu.testcases import solid_body
    adv0, u0, h0 = solid_body.build(ne=2, p=2)
    h0_1 = adv0.step(h0, u0)

    mesh = make_mesh(4)
    el_sh = element_sharding(mesh)
    adv1, u1, h1 = solid_body.build(ne=2, p=2, el_sharding=el_sh)
    h1_1 = adv1.step(h1, u1)

    np.testing.assert_allclose(np.asarray(h0_1), np.asarray(h1_1),
                               rtol=1e-11, atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_sw_step_runs():
    from mimsem_tpu.testcases import williamson2 as w2
    mesh = make_mesh(8)
    el_sh = element_sharding(mesh)
    sw, u, h = w2.build(ne=2, p=2, dt=600.0, el_sharding=el_sh,
                        gmres_restart=8, gmres_maxiter=1)
    uj, hj = sw.step(u, h)
    assert np.isfinite(np.asarray(uj)).all()
    assert np.isfinite(np.asarray(hj)).all()
