#!/usr/bin/env python
"""Held-Suarez idealized-climate production run on TPU.

Reference configuration (eul/HeldSuarez.cpp:25,275-298): NK=16 levels,
dt=120 s, hs_forcing on (k_T temperature relaxation toward the analytic
equilibrium + k_v boundary-layer friction), run for O(100) days; the
diagnostic is the CLIMATOLOGY -- zonal-mean westerly jets in both
hemispheres (plot with scr/plot_zonal_mean.py over the spun-up window).

Integrator: plain Strang by default -- the REFERENCE runs Held-Suarez
through Euler::Strang, not Strang_ec (eul/HeldSuarez.cpp:352); pass
HS_INTEGRATOR=ec (or argv[7]=ec) for the entropy-conserving path.
Advances in scanned chunks (one dispatch per dump interval) with
checkpoint/resume at every dump.

Usage: python demo/run_held_suarez.py [outdir] [ne] [nk] [days] [dt] [dump_hours] [integrator]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
# persistent compile cache: the tunneled TPU's remote-compile endpoint
# is intermittently flaky; cached executables make supervisor retries
# (and reruns) skip the ~10 min recompile
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/mimsem_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from mimsem_tpu.utils import io as mio


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "demo/held_suarez"
    ne = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    nk = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    days = float(sys.argv[4]) if len(sys.argv) > 4 else 30.0
    dt = float(sys.argv[5]) if len(sys.argv) > 5 else 120.0
    dump_hours = float(sys.argv[6]) if len(sys.argv) > 6 else 24.0
    integ = sys.argv[7] if len(sys.argv) > 7 else os.environ.get(
        "HS_INTEGRATOR", "strang")
    assert integ in ("strang", "ec"), integ
    nsteps = int(round(days * 86400.0 / dt))
    dump_every = max(1, min(int(round(dump_hours * 3600.0 / dt)), nsteps // 4))
    os.makedirs(outdir, exist_ok=True)

    from mimsem_tpu.testcases import held_suarez
    t0 = time.time()
    # Vertical-Newton knobs (same pattern as demo/run_umjs14.py): the
    # 2026-08-19 production run went NaN at step 3792 (day 5.3) via a
    # negative-density collapse in a top-layer column under chord nit=4;
    # the convergence knob is the remedy, as at UMJS14's wave-breaking.
    nit = int(os.environ.get("HS_NEWTON_ITERS", "4"))
    vnm = os.environ.get("HS_VERT_NEWTON", "chord")
    # biharmonic theta dissipation ON by default: the 2026-08-20 re-run
    # reached day 20.4 and then collapsed via an inviscid-theta surface
    # front (replay-verified insensitive to dt / f64 / Newton depth -- the
    # runaway is resolved dynamics at ne=6, not discretization).  The
    # reference ships do_temp_visc for exactly this (HorizSolve::advection_rhs,
    # eul/HorizSolve.cpp:341-360); spectral radius measured CFL-stable
    # (dt*lam ~ 0.09) after the density-pairing fix.
    tv = os.environ.get("HS_TEMP_VISC", "1") == "1"
    eul, state = held_suarez.build(ne=ne, p=3, nk=nk, dt=dt,
                                   dtype=jnp.float32, do_temp_visc=tv,
                                   newton_iters=nit, vert_newton=vnm)
    if integ == "ec":
        state = eul.init_state_ec(*state[:5])
    else:
        state = state[:5] + (state[0],)
    ndofs = (eul.ops.ln1 + 3 * eul.ops.ln2) * nk
    print(f"build {time.time()-t0:.1f}s  ne={ne} nk={nk} dofs={ndofs} "
          f"integrator={integ}", flush=True)

    hdr = ["keh", "kev", "pe", "ie", "k2p", "p2k", "k2i", "i2k", "k2i_z",
           "i2k_z", "mass", "entr"]
    skeys = ("velx", "w", "rho", "rt", "exner", "velx_prev") + (
        ("uz_prev",) if integ == "ec" else ())
    ckpt_path = os.path.join(outdir, "checkpoint.npz")
    t_run = 0.0
    if os.path.exists(ckpt_path):
        cstep, f = mio.load_checkpoint(ckpt_path)
        f = mio.migrate_velx_flux(f, eul.vo)   # pre-flux-form checkpoints
        state = tuple(jnp.asarray(f[k], eul.ops.dtype) for k in skeys)
        t_run = float(f["t_run"]) if "t_run" in f else 0.0
        step = cstep
        print(f"resumed from {ckpt_path} at step {step}", flush=True)
        if step >= nsteps:
            print(f"run already complete ({step}/{nsteps} steps)", flush=True)
            return
    else:
        t0 = time.time()
        if integ == "ec":
            state, aux = eul.step_ec(state, first=True)
        else:
            state = eul.step(state, first=True)
        jax.block_until_ready(state[0])
        t_run += time.time() - t0
        step = 1
        # bank step 1: a keeper retry must never repay the leapfrog start
        mio.save_checkpoint(ckpt_path, step, **dict(zip(skeys, state)),
                            t_run=np.float64(t_run))

    # one jitted scan per sub-chunk, synced + checkpointed (>=20 s apart) so
    # keeper retries only repay the rebuild; the sub-chunk length self-tunes
    # across retries exactly like demo/run_umjs14.py (the tunnel kills long
    # dispatches with UNAVAILABLE for stretches at a time)
    run_ec = jax.jit(eul.run_steps_ec if integ == "ec" else eul.run_steps,
                     static_argnums=1)
    max_chunk = int(os.environ.get("HS_MAX_CHUNK", "96"))
    marker = os.path.join(outdir, "tuner.json")
    try:
        with open(marker) as fh:
            m = json.load(fh)
        if m["step"] >= step:
            max_chunk = max(6, m["chunk"] // 2)
        elif step - m["step"] >= dump_every:
            max_chunk = min(240, m["chunk"] * 2)
        else:
            max_chunk = m["chunk"]
    except Exception:
        pass
    with open(marker, "w") as fh:
        json.dump(dict(step=step, chunk=max_chunk), fh)
    print(f"sub-chunk {max_chunk} steps", flush=True)
    t_saved = 0.0
    while step < nsteps:
        chunk = min(dump_every - (step % dump_every) or dump_every,
                    nsteps - step)
        t0 = time.time()
        done = 0
        k2i_acc = k2iz_acc = 0.0
        while done < chunk:
            sub = min(chunk - done, max_chunk)
            state, aux = run_ec(state, sub)
            if integ == "ec":
                k2i_acc = k2i_acc + float(aux["k2i_mean"]) * sub
                k2iz_acc = k2iz_acc + float(aux["k2i_z_mean"]) * sub
            done += sub
            jax.block_until_ready(state[0])
            nrm = float(np.max(np.asarray(
                aux["newton_norms" if integ == "ec" else "wmax"])))
            print(f"  [{time.strftime('%H:%M:%S')}] step {step + done}  "
                  f"{(step + done) / (t_run + time.time() - t0):.2f} steps/s"
                  f"  |d| {nrm:.1e}", flush=True)
            if not np.isfinite(nrm):
                mio.save_checkpoint(
                    os.path.join(outdir, "nan_state.npz"), step + done,
                    **dict(zip(skeys, state)))
                print(f"!! NaN in Newton norms at step {step + done}; "
                      "aborting (see nan_state.npz)", flush=True)
                sys.exit(42)
            if step + done < nsteps and time.time() - t_saved > 20.0:
                t_saved = time.time()
                mio.save_checkpoint(
                    ckpt_path, step + done, **dict(zip(skeys, state)),
                    t_run=np.float64(t_run + time.time() - t0))
        t_run += time.time() - t0
        step += chunk
        if step % dump_every == 0:
            velx, w, rho, rt, exner = state[:5]
            e = eul.energetics_ec(velx, w, rho, rt, exner,
                                  k2i=k2i_acc / chunk,
                                  k2i_z=k2iz_acc / chunk)
            e = {k: float(v) for k, v in e.items()}
            with open(os.path.join(outdir, "energetics.dat"), "a") as f:
                cols = [step * dt / 86400.0] + [e[k] for k in hdr]
                f.write("\t".join(f"{c:.16e}" for c in cols) + "\n")
            print(f"day {step*dt/86400.0:.1f}  {step/max(t_run,1e-9):.2f} "
                  f"steps/s  keh {e['keh']:.4e}", flush=True)
            dump = step // dump_every
            mio.write_layers(eul.ops, eul.vo,
                             dict(rho=("layer", rho), rt=("layer", rt),
                                  exner=("layer", exner), w=("interface", w),
                                  theta=("layer",
                                         eul.vo.diag_theta_l2(rho, rt)),
                                  u=("u1", velx)), dump, outdir)
            mio.save_checkpoint(ckpt_path, step, **dict(zip(skeys, state)),
                                t_run=np.float64(t_run))

    print(f"\n== {days} day(s), {nsteps} steps, wall {t_run:.0f}s "
          f"({nsteps/max(t_run,1e-9):.2f} steps/s)", flush=True)
    with open(os.path.join(outdir, "summary.txt"), "w") as f:
        f.write(f"ne={ne} nk={nk} days={days} dt={dt} steps={nsteps} "
                f"wall={t_run:.0f}s steps_per_s={nsteps/max(t_run,1e-9):.3f}\n")


if __name__ == "__main__":
    main()
