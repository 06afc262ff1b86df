#!/usr/bin/env python
"""Replay a UMJS14 checkpoint step-by-step to bisect an instability.

Forensics harness for the day-2.8 NaN of the 12-day production run: load
the last clean checkpoint, advance with `step_ec` one step at a time, and
print the full Newton increment-norm vector plus per-field max-abs after
every step, for one or more vertical-Newton iteration counts (the
chord/quasi-Newton solve reuses initial-state linearization blocks; a
divergent chord iteration at sharpening fronts shows up as norms GROWING
with more iterations).

Usage:
  python demo/replay_umjs14.py demo/umjs14/checkpoint.npz \
      [--ne 12] [--nk 30] [--dt 75] [--steps 60] [--iters 4 2 8] [--f64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mimsem_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--ne", type=int, default=12)
    ap.add_argument("--nk", type=int, default=30)
    ap.add_argument("--dt", type=float, default=75.0)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--iters", type=int, nargs="+", default=[4])
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--temp-visc", action="store_true",
                    help="enable the reference's biharmonic theta dissipation")
    ap.add_argument("--vert-newton", default="full", choices=["full", "chord"],
                    help="vertical Newton mode (production driver default: "
                    "full)")
    ap.add_argument("--dt-scale", type=float, default=1.0,
                    help="stability probe: scale dt (leapfrog memory in the "
                    "checkpoint is then approximate)")
    args = ap.parse_args()
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from mimsem_tpu.utils import io as mio
    from mimsem_tpu.testcases import umjs14

    dtype = jnp.float64 if args.f64 else jnp.float32
    t0 = time.time()
    kw = {}
    if args.temp_visc:
        kw["do_temp_visc"] = True
    eul, _ = umjs14.build(ne=args.ne, p=3, nk=args.nk,
                          dt=args.dt * args.dt_scale,
                          dtype=dtype, newton_iters=args.iters[0],
                          vert_newton=args.vert_newton, **kw)
    print(f"build {time.time()-t0:.0f}s", flush=True)
    skeys = ("velx", "w", "rho", "rt", "exner", "velx_prev", "uz_prev")
    cstep, f = mio.load_checkpoint(args.ckpt)
    f = mio.migrate_velx_flux(f, eul.vo)   # pre-flux-form checkpoints
    state0 = tuple(jnp.asarray(f[k], dtype) for k in skeys)
    print(f"replaying from step {cstep}", flush=True)

    for nit in args.iters:
        eul.newton_iters = nit
        step_fn = jax.jit(lambda st: eul.step_ec(st))
        state = state0
        print(f"--- newton_iters={nit}", flush=True)
        t0 = time.time()
        for s in range(args.steps):
            state, aux = step_fn(state)
            nrm = np.asarray(aux["newton_norms"], np.float64)
            mx = [float(np.max(np.abs(np.asarray(x, np.float64))))
                  for x in state[:5]]
            wf = np.abs(np.asarray(state[1], np.float64))
            loc = np.unravel_index(np.argmax(wf), wf.shape)
            thmin = float(np.min(np.asarray(eul.vo.phys_layer(
                eul.vo.diag_theta_l2(state[2], state[3])), np.float64)))
            print(f"  step {cstep+s+1}  norms {np.array2string(nrm, precision=2)}"
                  f"  max velx {mx[0]:.3e} w {mx[1]:.3e}@{loc} rho {mx[2]:.3e} "
                  f"rt {mx[3]:.3e} pi {mx[4]:.3e}  min_theta {thmin:.3e}",
                  flush=True)
            if not np.all(np.isfinite(nrm)):
                print(f"  NaN at step {cstep+s+1} "
                      f"({time.time()-t0:.0f}s in)", flush=True)
                break
        else:
            print(f"  survived {args.steps} steps "
                  f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
