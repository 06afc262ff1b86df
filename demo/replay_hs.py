#!/usr/bin/env python
"""Replay the Held-Suarez NaN (step 3600 -> ~3792, 2026-08-19) from the
production checkpoint under a scheme variant, with per-step diagnostics
(min theta, max |w| physical, total energy, min rho) to discriminate
hypotheses exactly like demo/hs_probe.py did for the step-385 EC blowup:

  base        chord nit=4 f32      (the production config that NaN'd)
  it8         chord nit=8
  full8       vert_newton=full nit=8   (the combo that crossed UMJS14's
                                        wave-breaking collapse)
  f64         chord nit=4 f64
  dt60        chord nit=4, dt=60 (checkpoint step count is rescaled x2)
  tv          + biharmonic theta dissipation

Usage: python demo/replay_hs.py VARIANT [nsteps] [chunk] [ckpt]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mimsem_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from mimsem_tpu.utils import io as mio


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    ckpt = sys.argv[4] if len(sys.argv) > 4 else \
        "demo/held_suarez/checkpoint.npz"

    kw = {}
    dtype = jnp.float64 if "f64" in variant else jnp.float32
    if "f64" in variant:
        jax.config.update("jax_enable_x64", True)
    if "fr" in variant:
        # mixed precision: f32 state/blocks, f64 vertical residual assembly
        # (Euler3D f64_resid; needs x64 for the f64 branch to exist)
        jax.config.update("jax_enable_x64", True)
        kw.update(f64_resid=True)
    if "it8" in variant:
        kw.update(newton_iters=8)
    if "full8" in variant:
        kw.update(newton_iters=8, vert_newton="full")
    if "tv" in variant:
        kw.update(do_temp_visc=True)
    if "nof" in variant:
        kw.update(hs_forcing=False)
    if "ray8" in variant:
        # deeper Rayleigh absorber (8 graded interfaces, as mountain_wave):
        # the day-49.7 collapse pumps a rho/theta 2dz zigzag with |w|~1 m/s
        # at interfaces 6-10, below the reference's 3-interface sponge
        kw.update(rayleigh_levels=8)
    if "notv" in variant:
        kw.update(do_temp_visc=False)
    if "noup" in variant:
        kw.update(theta_upwind=False)
    dt = 60.0 if "dt60" in variant else 120.0

    from mimsem_tpu.testcases import held_suarez
    t0 = time.time()
    eul, st0 = held_suarez.build(ne=6, p=3, nk=16, dt=dt, dtype=dtype, **kw)
    print(f"build {time.time()-t0:.1f}s variant={variant} "
          f"dtype={dtype.__name__} kw={kw}", flush=True)

    skeys = ("velx", "w", "rho", "rt", "exner", "velx_prev")
    if ckpt == "none":
        # from-IC stability probe (e.g. is do_temp_visc CFL-stable on a
        # HEALTHY state, vs. replaying into an already-collapsing front)
        cstep, state = 0, tuple(jnp.asarray(x, eul.ops.dtype) for x in st0)
        print("running from the initial condition", flush=True)
    else:
        cstep, f = mio.load_checkpoint(ckpt)
        state = tuple(jnp.asarray(f[k], eul.ops.dtype) for k in skeys)
        print(f"replaying from step {cstep}", flush=True)

    vo = eul.vo

    def diags(st):
        velx, w, rho, rt = st[0], st[1], st[2], st[3]
        thp = vo.phys_layer(vo.diag_theta_l2(rho, rt))
        e = eul.energetics_ec(velx, w, rho, rt, st[4])
        tot = e["keh"] + e["kev"] + e["pe"] + e["ie"]
        return (jnp.min(thp), jnp.max(jnp.abs(vo.phys_int(w))),
                tot, jnp.min(vo.phys_layer(rho)))

    def chunk_fn(st, n):
        def body(s, _):
            s = eul._step_impl(*s, jnp.asarray(False))
            return s, diags(s)
        return jax.lax.scan(body, st, None, length=n)

    run = jax.jit(chunk_fn, static_argnums=1)
    step = 0
    t0 = time.time()
    while step < nsteps:
        n = min(chunk, nsteps - step)
        state, (thmin, wmax, etot, rhomin) = run(state, n)
        jax.block_until_ready(state[0])
        step += n
        fin = np.isfinite(np.asarray(thmin))
        print(f"[{time.strftime('%H:%M:%S')}] +{step} "
              f"({step/(time.time()-t0):.2f} st/s)  "
              f"min_th {float(thmin[-1]):.2f}  max_w {float(wmax[-1]):.3e}"
              f"  dE/E {(float(etot[-1])-float(etot[0]))/abs(float(etot[0])):+.3e}"
              f"  min_rho {float(rhomin[-1]):.4f}", flush=True)
        if not fin.all():
            bad = int(np.argmax(~fin))
            print(f"!! NaN inside chunk at step ~{cstep + step - n + bad + 1}"
                  f"  (last finite: min_th "
                  f"{float(thmin[bad-1]) if bad else float('nan'):.2f} "
                  f"max_w {float(wmax[bad-1]) if bad else float('nan'):.3e})",
                  flush=True)
            break
        thp = np.asarray(vo.phys_layer(vo.diag_theta_l2(state[2], state[3])))
        lev, el, q = np.unravel_index(np.argmin(thp), thp.shape)
        wv = np.asarray(vo.phys_int(state[1]))
        wl, we, wq_ = np.unravel_index(np.argmax(np.abs(wv)), wv.shape)
        print(f"    th_min at lev={lev} el={el}; |w|_max at int={wl} el={we}"
              f" = {wv[wl, we, wq_]:.3e} m/s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
