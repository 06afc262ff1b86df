"""Self-contained multi-chip dry run on an n-device CPU mesh.

Run as `python -m mimsem_tpu.parallel.dryrun N` in a process whose
environment forces the CPU backend (JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=N, and PALLAS_AXON_POOL_IPS
unset so the axon sitecustomize hook cannot register the tunneled TPU).
`__graft_entry__.dryrun_multichip` spawns exactly that subprocess.

Validates the full SW training step (Picard residual + coupled GMRES solve)
jitted over a real jax.sharding.Mesh — the horizontal domain decomposition
that is the reference's only distributed axis (SURVEY.md section 2.6,
scr/Setup.py:25-29) — and asserts the sharded result matches the
single-device result, the TPU-native analogue of the reference's
"mpirun -np 6 on one box" check.
"""
from __future__ import annotations

import os
import sys


def _require_cpu_mesh(n_devices: int):
    import jax
    plats = {d.platform for d in jax.devices()}
    if plats != {"cpu"}:
        raise RuntimeError(f"dryrun must run on CPU devices, got {plats}")
    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            "(XLA_FLAGS=--xla_force_host_platform_device_count not applied?)")


def run(n_devices: int) -> None:
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    _require_cpu_mesh(n_devices)

    from mimsem_tpu.parallel.sharding import make_mesh, element_sharding
    from mimsem_tpu.testcases import williamson2 as w2

    # ne=4: 6*4=24 element rows divide any n_devices<=24 that divides 24, so
    # the owner-computes shard_map DSS (parallel/spmd_dss.py) is active; with
    # a non-divisible grid LocalOps falls back to GSPMD transparently.
    ne = 4 if 24 % n_devices == 0 else 2

    # --- single-device reference result ---------------------------------
    sw0, u0, h0 = w2.build(ne=ne, p=3, dt=600.0, dtype=jnp.float64,
                           gmres_restart=20, gmres_maxiter=2)
    u_ref, h_ref = jax.jit(sw0._step_impl)(u0, h0)
    u_ref, h_ref = np.asarray(u_ref), np.asarray(h_ref)

    # --- sharded over the n-device mesh ----------------------------------
    mesh = make_mesh(n_devices)
    el_sh = element_sharding(mesh)
    sw, u, h = w2.build(ne=ne, p=3, dt=600.0, dtype=jnp.float64,
                        el_sharding=el_sh, gmres_restart=20, gmres_maxiter=2)
    if 24 % n_devices == 0:
        assert sw.ops.spmd is not None, "owner-computes DSS should be active"
    step = jax.jit(sw._step_impl)
    u1, h1 = step(u, h)
    jax.block_until_ready((u1, h1))

    # equivalence (not just isfinite): sharded == single-device to
    # reduction-reordering tolerance in f64
    du = np.linalg.norm(np.asarray(u1) - u_ref) / np.linalg.norm(u_ref)
    dh = np.linalg.norm(np.asarray(h1) - h_ref) / np.linalg.norm(h_ref)
    assert du < 1e-10, f"sharded u differs from single-device: rel={du:.3e}"
    assert dh < 1e-10, f"sharded h differs from single-device: rel={dh:.3e}"

    # multi-step scan (the production training loop) compiles + executes
    u3, h3 = jax.jit(lambda a, b: sw.run_steps(a, b, 3))(u, h)
    jax.block_until_ready((u3, h3))
    assert np.isfinite(np.asarray(u3)).all() and np.isfinite(np.asarray(h3)).all()

    # --- 2-D (row-block x col-block) tile mesh (sharding v3) --------------
    # the SURVEY 2.6 (face, fy, fx) product decomposition: tile-major
    # element permutation + E-W cross-tile ppermute (parallel/spmd_dss.py)
    from mimsem_tpu.parallel.sharding import choose_tiling, make_mesh2
    d2 = None
    for dr in range(n_devices, 0, -1):      # force a genuinely 2-D tiling
        dc = n_devices // dr
        if dr * dc == n_devices and dc > 1 and (6 * ne) % dr == 0 \
                and ne % dc == 0:
            d2 = (dr, dc)
            break
    du2 = dh2 = None
    if d2 is not None:
        mesh2 = make_mesh2(*d2)
        sw2, uu, hh = w2.build(ne=ne, p=3, dt=600.0, dtype=jnp.float64,
                               el_sharding=element_sharding(mesh2),
                               gmres_restart=20, gmres_maxiter=2)
        assert sw2.ops.spmd is not None and sw2.ops.spmd.Dc == d2[1]
        u2, h2 = jax.jit(sw2._step_impl)(uu, hh)
        u2 = np.asarray(sw2.ops.struct_order(u2))
        h2 = np.asarray(sw2.ops.struct_order(h2))
        du2 = np.linalg.norm(u2 - u_ref) / np.linalg.norm(u_ref)
        dh2 = np.linalg.norm(h2 - h_ref) / np.linalg.norm(h_ref)
        assert du2 < 1e-10, f"2-D-tiled u differs: rel={du2:.3e}"
        assert dh2 < 1e-10, f"2-D-tiled h differs: rel={dh2:.3e}"

    # --- 3D EC Euler step (the flagship model) over the same mesh ---------
    # box with n_devices element rows so the owner-computes DSS shards
    # evenly; vmapped-over-levels DSS rides the same collective schedule
    from mimsem_tpu.testcases import bubble
    ne3 = 4 if 4 % n_devices == 0 else n_devices
    eul0, st0 = bubble.build(ne=ne3, p=2, nk=4, dt=0.5)
    ra, _ = eul0.step_ec(eul0.init_state_ec(*st0[:5]), first=True)
    eul1, st1 = bubble.build(ne=ne3, p=2, nk=4, dt=0.5, el_sharding=el_sh)
    assert eul1.ops.spmd is not None, "3D owner-computes DSS should be active"
    rb, _ = eul1.step_ec(eul1.init_state_ec(*st1[:5]), first=True)
    jax.block_until_ready(rb[0])
    errs = {}
    for xa, xb, name in zip(ra[:5], rb[:5],
                            ("velx", "w", "rho", "rt", "exner")):
        na = np.linalg.norm(np.asarray(xa).ravel())
        errs[name] = (np.linalg.norm((np.asarray(xa) - np.asarray(xb)).ravel())
                      / max(na, 1.0))
        assert errs[name] < 1e-10, f"sharded 3D {name}: rel={errs[name]:.3e}"
    de = max(errs.values())

    # --- production-shaped sphere EC step (UMJS14 ne=12/nk=30) ------------
    # the toy bubble above proves the collective schedule; this catches the
    # shape/memory cliffs of the REAL flagship configuration (deg-3 cubed
    # sphere, 30 stretched levels, 1.32M DOF) on a genuinely 2-D tile mesh.
    dp = None
    for dr in range(n_devices, 0, -1):
        dc = n_devices // dr
        if dr * dc == n_devices and dc > 1 and 72 % dr == 0 and 12 % dc == 0:
            dp = (dr, dc)
            break
    dprod = None
    if dp is not None:
        from mimsem_tpu.testcases import umjs14
        eu0, su0 = umjs14.build(ne=12, p=3, nk=30, dt=75.0,
                                dtype=jnp.float64, newton_iters=2)
        rpa, _ = eu0.step_ec(su0, first=True)
        meshp = make_mesh2(*dp)
        eu1, su1 = umjs14.build(ne=12, p=3, nk=30, dt=75.0,
                                dtype=jnp.float64, newton_iters=2,
                                el_sharding=element_sharding(meshp))
        assert eu1.ops.spmd is not None and eu1.ops.spmd.Dc == dp[1], \
            "production-shape owner-computes DSS should be active"
        rpb, _ = eu1.step_ec(su1, first=True)
        jax.block_until_ready(rpb[0])
        perrs = {}
        for xa, xb, name in zip(rpa[:5], rpb[:5],
                                ("velx", "w", "rho", "rt", "exner")):
            xb = eu1.ops.struct_order(xb)
            na = np.linalg.norm(np.asarray(xa).ravel())
            perrs[name] = (np.linalg.norm(
                (np.asarray(xa) - np.asarray(xb)).ravel()) / max(na, 1.0))
            assert perrs[name] < 1e-10, \
                f"production-shape 3D {name}: rel={perrs[name]:.3e}"
        dprod = max(perrs.values())

    tile = "" if du2 is None else (
        f"; 2-D tile mesh {d2} rel err u={du2:.2e} h={dh2:.2e}")
    prod = "" if dprod is None else (
        f"; UMJS14 ne=12/nk=30 EC step on 2-D mesh {dp} rel err "
        f"max={dprod:.2e}")
    print(f"dryrun_multichip OK: {n_devices} devices, "
          f"SW sharded-vs-single rel err u={du:.2e} h={dh:.2e}; "
          f"Euler3D EC step rel err max={de:.2e} ({errs}){tile}{prod}")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
