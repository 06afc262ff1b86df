"""Sharding v2: owner-computes SPMD DSS correctness (parallel/spmd_dss.py).

The TPU-native analogue of the reference's VecScatter ghost exchange
(src/Topo.cpp:144-154): explicit shard_map halo schedule -- in-face sums
local, row-boundary strips over nearest-neighbor ppermute, the 12 cube-edge
pairs + 8 vertices over one packed boundary psum.  All tests assert
BIT-EXACT agreement with the single-device slicing DSS on a genuine
multi-device CPU mesh (conftest forces 8 virtual devices).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mimsem_tpu.parallel.sharding import (make_mesh, make_mesh2,
                                          element_sharding, choose_tiling,
                                          tile_perm)


def _build_ops(ne, p, el_sharding=None, kind="sphere"):
    from mimsem_tpu.basis import make_basis
    from mimsem_tpu.ops.local_form import LocalOps
    if kind == "sphere":
        from mimsem_tpu.mesh.cubed_sphere import cubed_sphere_mesh
        mesh = cubed_sphere_mesh(ne)
    else:
        from mimsem_tpu.mesh.box import periodic_box_mesh
        mesh = periodic_box_mesh(ne, ne)
    from mimsem_tpu.mesh.topology import build_topology
    from mimsem_tpu.mesh.geometry import build_geometry
    topo = build_topology(mesh, p)
    basis = make_basis(p)
    geom = build_geometry(mesh, basis)
    return LocalOps(topo, basis, geom, mesh, el_sharding=el_sharding)


needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs8
@pytest.mark.parametrize("ndev", [4, 8])
def test_spmd_dss_bit_exact_sphere(ndev):
    """dss0/dss1 on the cubed sphere, plain and vmapped (the 3D level-batch
    pattern), at R=6 (multi-face blocks) and R=3 rows per device."""
    ops0 = _build_ops(4, 3)
    mesh = make_mesh(ndev)
    ops1 = _build_ops(4, 3, el_sharding=element_sharding(mesh))
    assert ops1.spmd is not None and ops1.spmd.D == ndev

    rng = np.random.default_rng(1)
    v0 = jnp.asarray(rng.standard_normal(ops0.ln0))
    v1 = jnp.asarray(rng.standard_normal(ops0.ln1))
    assert np.array_equal(np.asarray(jax.jit(ops0.dss0)(v0)),
                          np.asarray(jax.jit(ops1.dss0)(v0)))
    assert np.array_equal(np.asarray(jax.jit(ops0.dss1)(v1)),
                          np.asarray(jax.jit(ops1.dss1)(v1)))

    vb = jnp.asarray(rng.standard_normal((3, ops0.ln1)))
    assert np.array_equal(np.asarray(jax.jit(jax.vmap(ops0.dss1))(vb)),
                          np.asarray(jax.jit(jax.vmap(ops1.dss1))(vb)))


@needs8
@pytest.mark.parametrize("kind", ["sphere", "box"])
@pytest.mark.parametrize("tiling", [(4, 2), (2, 4), (1, 4), (2, 2)])
def test_spmd_dss_bit_exact_2d(kind, tiling):
    """2-D (row-block x col-block) tile decomposition (sharding v3, the
    SURVEY 2.6 (face, fy, fx) product): tile-major el_perm storage, E-W
    cross-tile ppermute along the column mesh axis, bit-exact vs the
    single-device slicing DSS after undoing the permutation.  Covers
    column-only sharding (Dr=1) and the periodic box E-W/N-S wraparounds."""
    dr, dc = tiling
    ops0 = _build_ops(4, 3, kind=kind)
    ops1 = _build_ops(4, 3, el_sharding=element_sharding(make_mesh2(dr, dc)),
                      kind=kind)
    assert ops1.spmd is not None and (ops1.spmd.Dr, ops1.spmd.Dc) == (dr, dc)
    perm = ops1.el_perm
    K0, K1 = (ops1.p + 1) ** 2, 2 * ops1.n1loc

    rng = np.random.default_rng(3)
    v0 = jnp.asarray(rng.standard_normal(ops0.ln0))
    v1 = jnp.asarray(rng.standard_normal(ops0.ln1))
    v0p = jnp.asarray(np.asarray(v0).reshape(-1, K0)[perm].reshape(-1))
    v1p = jnp.asarray(np.asarray(v1).reshape(-1, K1)[perm].reshape(-1))
    assert np.array_equal(
        np.asarray(jax.jit(ops0.dss0)(v0)),
        np.asarray(ops1.struct_order(jax.jit(ops1.dss0)(v0p))))
    assert np.array_equal(
        np.asarray(jax.jit(ops0.dss1)(v1)),
        np.asarray(ops1.struct_order(jax.jit(ops1.dss1)(v1p))))


@pytest.mark.parametrize("kind", ["sphere", "box"])
def test_pallas_dss_bit_exact(kind):
    """The single-launch Pallas DSS (LocalOps._pallas_dss; interpret mode on
    CPU, Mosaic on TPU) must be bit-identical to the slicing DSS -- it runs
    the SAME core inside one kernel."""
    ops = _build_ops(4, 3, kind=kind)
    rng = np.random.default_rng(5)
    v0 = jnp.asarray(rng.standard_normal(ops.ln0))
    v1 = jnp.asarray(rng.standard_normal(ops.ln1))
    r0 = np.asarray(jax.jit(ops.dss0)(v0))
    r1 = np.asarray(jax.jit(ops.dss1)(v1))
    ops.pallas_dss = True
    assert np.array_equal(r0, np.asarray(jax.jit(ops.dss0)(v0)))
    assert np.array_equal(r1, np.asarray(jax.jit(ops.dss1)(v1)))
    vb = jnp.asarray(rng.standard_normal((3, ops.ln1)))
    pb = np.asarray(jax.jit(jax.vmap(ops.dss1))(vb))
    ops.pallas_dss = False
    assert np.array_equal(np.asarray(jax.jit(jax.vmap(ops.dss1))(vb)), pb)


def test_choose_tiling():
    """Factorization picks valid, most-square tilings and refuses cleanly."""
    assert choose_tiling(8, 24, 4) in ((8, 1), (4, 2), (2, 4))
    dr, dc = choose_tiling(8, 24, 4)
    assert 24 % dr == 0 and 4 % dc == 0 and dr * dc == 8
    assert choose_tiling(7, 24, 4) is None          # 7 divides neither
    assert choose_tiling(16, 24, 4) == (8, 2)       # 1-D impossible, 2-D works
    p = tile_perm(4, 4, 2, 2)
    assert sorted(p.tolist()) == list(range(16))
    # device 0 owns the [0:2, 0:2] tile of the 4x4 grid
    assert p[:4].tolist() == [0, 1, 4, 5]


@needs8
def test_spmd_gspmd_fallback_warns():
    """A device mesh that cannot tile the element grid must warn loudly
    (the round-2 silent-GSPMD-fallback weakness), not silently degrade.
    (The element count must still divide the device count or device_put
    itself rejects the sharding -- a 2x6 box over 4 devices is the
    GSPMD-reachable case: 12 elements but only 2 rows.)"""
    from mimsem_tpu.mesh.box import periodic_box_mesh
    from mimsem_tpu.mesh.topology import build_topology
    from mimsem_tpu.mesh.geometry import build_geometry
    from mimsem_tpu.ops.local_form import LocalOps
    mesh = periodic_box_mesh(6, 2)                   # rows=2 % 4 != 0
    topo = build_topology(mesh, 2)
    from mimsem_tpu.basis import make_basis
    b = make_basis(2)
    geom = build_geometry(mesh, b)
    with pytest.warns(UserWarning, match="GSPMD"):
        ops = LocalOps(topo, b, geom, mesh,
                       el_sharding=element_sharding(make_mesh(4)))
    assert ops.spmd is None


@needs8
def test_spmd_sw_step_equivalence_2d():
    """Full SW Picard step on a (4, 2) tile mesh == single device."""
    from mimsem_tpu.testcases import williamson2 as w2
    sw0, u0, h0 = w2.build(ne=4, p=3, dt=600.0, gmres_restart=20,
                           gmres_maxiter=2)
    sw1, u1, h1 = w2.build(ne=4, p=3, dt=600.0, gmres_restart=20,
                           gmres_maxiter=2,
                           el_sharding=element_sharding(make_mesh2(4, 2)))
    assert sw1.ops.spmd is not None and sw1.ops.spmd.Dc == 2
    ua, ha = jax.jit(sw0._step_impl)(u0, h0)
    ub, hb = jax.jit(sw1._step_impl)(u1, h1)
    ub, hb = sw1.ops.struct_order(ub), sw1.ops.struct_order(hb)
    du = np.linalg.norm(np.asarray(ua) - np.asarray(ub)) \
        / np.linalg.norm(np.asarray(ua))
    dh = np.linalg.norm(np.asarray(ha) - np.asarray(hb)) \
        / np.linalg.norm(np.asarray(ha))
    assert du < 1e-12, du
    assert dh < 1e-12, dh


@needs8
def test_spmd_dss_box_periodic():
    """Periodic box: cross-block wraparound permutes, no panel exchange."""
    ops0 = _build_ops(4, 2, kind="box")
    mesh = make_mesh(4)
    ops1 = _build_ops(4, 2, el_sharding=element_sharding(mesh), kind="box")
    assert ops1.spmd is not None
    rng = np.random.default_rng(2)
    v0 = jnp.asarray(rng.standard_normal(ops0.ln0))
    v1 = jnp.asarray(rng.standard_normal(ops0.ln1))
    assert np.array_equal(np.asarray(jax.jit(ops0.dss0)(v0)),
                          np.asarray(jax.jit(ops1.dss0)(v0)))
    assert np.array_equal(np.asarray(jax.jit(ops0.dss1)(v1)),
                          np.asarray(jax.jit(ops1.dss1)(v1)))


@needs8
def test_spmd_sw_step_equivalence():
    """Full SW Picard step sharded over 8 devices == single device (to
    reduction-reordering tolerance; the Krylov dots psum in a different
    order)."""
    from mimsem_tpu.testcases import williamson2 as w2
    sw0, u0, h0 = w2.build(ne=4, p=3, dt=600.0, gmres_restart=20,
                           gmres_maxiter=2)
    mesh = make_mesh(8)
    sw1, u1, h1 = w2.build(ne=4, p=3, dt=600.0, gmres_restart=20,
                           gmres_maxiter=2,
                           el_sharding=element_sharding(mesh))
    assert sw1.ops.spmd is not None
    ua, ha = jax.jit(sw0._step_impl)(u0, h0)
    ub, hb = jax.jit(sw1._step_impl)(u1, h1)
    du = np.linalg.norm(np.asarray(ua) - np.asarray(ub)) \
        / np.linalg.norm(np.asarray(ua))
    dh = np.linalg.norm(np.asarray(ha) - np.asarray(hb)) \
        / np.linalg.norm(np.asarray(ha))
    assert du < 1e-12, du
    assert dh < 1e-12, dh


@needs8
def test_spmd_euler3d_step_equivalence():
    """3D EC Euler step (vmapped DSS over levels) sharded == single device."""
    from mimsem_tpu.testcases import bubble
    eul0, st0 = bubble.build(ne=4, p=2, nk=4, dt=0.5)
    mesh = make_mesh(4)
    eul1, st1 = bubble.build(ne=4, p=2, nk=4, dt=0.5,
                             el_sharding=element_sharding(mesh))
    assert eul1.ops.spmd is not None
    a = eul0.init_state_ec(*st0[:5])
    b = eul1.init_state_ec(*st1[:5])
    a, _ = eul0.step_ec(a, first=True)
    b, _ = eul1.step_ec(b, first=True)
    for xa, xb, name in zip(a[:5], b[:5],
                            ("velx", "w", "rho", "rt", "exner")):
        na = np.linalg.norm(np.asarray(xa).ravel())
        d = np.linalg.norm((np.asarray(xa) - np.asarray(xb)).ravel())
        assert d <= 5e-10 * max(na, 1.0), (name, d / max(na, 1.0))


@needs8
def test_spmd_euler3d_step_equivalence_2d():
    """3D EC Euler step on a 2-D (2, 2) tile mesh == single device: the
    tile-major element permutation must thread through the vertical-ops
    levels, the vmapped-over-levels DSS, and the column Newton solve."""
    from mimsem_tpu.testcases import bubble
    eul0, st0 = bubble.build(ne=4, p=2, nk=4, dt=0.5)
    eul1, st1 = bubble.build(ne=4, p=2, nk=4, dt=0.5,
                             el_sharding=element_sharding(make_mesh2(2, 2)))
    assert eul1.ops.spmd is not None and eul1.ops.spmd.Dc == 2
    a = eul0.init_state_ec(*st0[:5])
    b = eul1.init_state_ec(*st1[:5])
    a, _ = eul0.step_ec(a, first=True)
    b, _ = eul1.step_ec(b, first=True)
    for xa, xb, name in zip(a[:5], b[:5],
                            ("velx", "w", "rho", "rt", "exner")):
        xb = eul1.ops.struct_order(xb)
        na = np.linalg.norm(np.asarray(xa).ravel())
        d = np.linalg.norm((np.asarray(xa) - np.asarray(xb)).ravel())
        assert d <= 5e-10 * max(na, 1.0), (name, d / max(na, 1.0))


@needs8
def test_spmd_collective_footprint():
    """The optimized sharded SW step must not contain all-gathers (the
    round-1 replicated-DOF symptom) and its collective traffic must stay
    within a small multiple of the state size (measured 2.7x vs 147x for
    GSPMD round-1)."""
    import re
    from mimsem_tpu.testcases import williamson2 as w2
    mesh = make_mesh(8)
    sw, u, h = w2.build(ne=4, p=3, dt=600.0, gmres_restart=20,
                        gmres_maxiter=2, el_sharding=element_sharding(mesh))
    hlo = jax.jit(sw._step_impl).lower(u, h).compile().as_text()
    n_ag = len(re.findall(r" all-gather(?:-start)?\(", hlo))
    n_cp = len(re.findall(r" collective-permute(?:-start)?\(", hlo))
    assert n_ag == 0, f"{n_ag} all-gathers in sharded step"
    assert n_cp < 400, f"{n_cp} collective-permutes"
