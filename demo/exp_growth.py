#!/usr/bin/env python
"""Baroclinic growth-rate probe: continue a UMJS14 checkpoint under variant
physics flags and log the two standard wave-growth metrics every few hours
of model time:

  * NH minimum surface pressure (hPa, from the lowest-layer Exner field)
  * max |v| (meridional wind) near z = 1 km in the NH storm-track band

Used to bisect why the 12-day production run's wave deepened only ~1.4 hPa
(UMJS14 QJRMS 2014 Fig. 8 shows ~35 hPa by day 10): variants toggle the
optional dissipation terms (biharmonic momentum viscosity, upwinded-theta
vertical diagnosis) to separate "over-damped" from "structurally wrong".

Usage:
  python demo/exp_growth.py demo/umjs14/checkpoint.npz [--steps 1728]
      [--chunk 24] [--metric-every 144] [--no-visc] [--no-theta-upwind]
      [--ne 12] [--nk 30] [--dt 75]
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
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--ne", type=int, default=12)
    ap.add_argument("--nk", type=int, default=30)
    ap.add_argument("--dt", type=float, default=75.0)
    ap.add_argument("--steps", type=int, default=1728)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--metric-every", type=int, default=144)
    ap.add_argument("--no-visc", action="store_true")
    ap.add_argument("--no-theta-upwind", action="store_true")
    ap.add_argument("--newton-iters", type=int, default=4)
    ap.add_argument("--scheme", choices=("ec", "strang"), default="ec",
                    help="continue with step_ec (production) or the plain "
                    "Strang step (drops the EC-state uz_prev carry)")
    args = ap.parse_args()

    from mimsem_tpu.utils import io as mio
    from mimsem_tpu.testcases import umjs14
    from mimsem_tpu.models.vertical import RD, CP, P0

    t0 = time.time()
    eul, _ = umjs14.build(ne=args.ne, p=3, nk=args.nk, dt=args.dt,
                          dtype=jnp.float32, newton_iters=args.newton_iters,
                          vert_newton="full",
                          do_visc=not args.no_visc,
                          theta_upwind=not args.no_theta_upwind)
    print(f"build {time.time()-t0:.0f}s  visc={not args.no_visc} "
          f"theta_upwind={not args.no_theta_upwind}", flush=True)

    skeys = ("velx", "w", "rho", "rt", "exner", "velx_prev", "uz_prev")
    if args.scheme == "strang":
        skeys = skeys[:-1]
    cstep, f = mio.load_checkpoint(args.ckpt)
    f = mio.migrate_velx_flux(f, eul.vo)   # pre-flux-form checkpoints
    state = tuple(jnp.asarray(f[k], jnp.float32) for k in skeys)
    print(f"loaded {args.ckpt} at step {cstep} scheme={args.scheme}",
          flush=True)

    lat = np.degrees(np.asarray(eul.ops.lonlat)[..., 1])      # (nel, nq)
    nh = (lat > 20.0) & (lat < 80.0)
    # layer index nearest z = 1 km (stretched levels)
    zmid = 0.5 * np.asarray(eul.vo.levs[:-1] + eul.vo.levs[1:]).mean((1, 2))
    l1km = int(np.argmin(np.abs(zmid - 1000.0)))

    @jax.jit
    def metrics(state):
        velx, w, rho, rt, exner = state[:5]
        pex = eul.vo.phys_layer(exner)[0]
        p = P0 * (pex / CP) ** (CP / RD) / 100.0
        # flux-form coefficients: physical wind = interp/thick
        up = eul.ops.interp1_phys(velx[l1km]) * eul.tiq[l1km][..., None]
        v = jnp.abs(up[..., 1])
        return (jnp.min(jnp.where(nh, p, 1e9)),
                jnp.max(jnp.where(nh, v, 0.0)))

    run_ec = jax.jit(eul.run_steps_ec if args.scheme == "ec"
                     else eul.run_steps, static_argnums=1)
    pmin0, vmax0 = metrics(state)
    print(f"t=+0.00d  pmin {float(pmin0):9.3f} hPa  vmax(z~{zmid[l1km]:.0f}m)"
          f" {float(vmax0):7.3f} m/s", flush=True)

    done = 0
    t_run = time.time()
    while done < args.steps:
        sub = min(args.chunk, args.steps - done)
        state, aux = run_ec(state, sub)
        done += sub
        jax.block_until_ready(state[0])
        nrm = float(np.max(np.asarray(
            aux["newton_norms" if args.scheme == "ec" else "wmax"])))
        if not np.isfinite(nrm):
            print(f"!! NaN at +{done} steps", flush=True)
            sys.exit(42)
        if done % args.metric_every == 0 or done == args.steps:
            pmin, vmax = metrics(state)
            print(f"t=+{done*args.dt/86400.0:.2f}d  pmin {float(pmin):9.3f} "
                  f"hPa  vmax {float(vmax):7.3f} m/s  "
                  f"[{done/(time.time()-t_run):.2f} steps/s]", flush=True)


if __name__ == "__main__":
    main()
