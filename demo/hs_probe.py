#!/usr/bin/env python
"""Held-Suarez instability probe: run one scheme variant and track the
growth (min theta, max |w|, Newton norms) to discriminate hypotheses for
the step-385 NaN (2026-08-18).  Variants:

  ec_f        step_ec + hs_forcing            (known NaN @ 385)
  strang_f    plain Strang + hs_forcing       (the reference HS config)
  ec_nof      step_ec, forcing off            (pure balanced state)
  strang_nof  plain Strang, forcing off
  ec_f_it12   step_ec + forcing, 12 full-Newton iterations
  ec_f_f64    step_ec + forcing, f64 model state

Usage: python demo/hs_probe.py VARIANT [nsteps] [chunk]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mimsem_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def main():
    variant = sys.argv[1]
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 720
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    kw = {}
    dtype = jnp.float32
    if "f64" in variant:
        dtype = jnp.float64
    if "it12" in variant:
        kw.update(newton_iters=12, vert_newton="full")
    if "nora" in variant:
        kw.update(rayleigh=0.0)
    if "hc" in variant:
        kw.update(corr_centering="h")   # experimental half-state corrector
    if "tv" in variant:
        kw.update(do_temp_visc=True)    # biharmonic theta dissipation (the
                                        # reference's EC stabilizer knob)
    dt = 120.0
    if "dt60" in variant:
        dt = 60.0
    forcing = "nof" not in variant
    ec = variant.startswith("ec")

    from mimsem_tpu.testcases import held_suarez
    t0 = time.time()
    eul, state0 = held_suarez.build(ne=6, p=3, nk=16, dt=dt, dtype=dtype,
                                    **kw)
    eul.hs_forcing = forcing
    print(f"build {time.time()-t0:.1f}s variant={variant} forcing={forcing} "
          f"ec={ec} dtype={dtype.__name__}", flush=True)

    vo = eul.vo

    def diags(st):
        velx, w, rho, rt = st[0], st[1], st[2], st[3]
        thp = vo.phys_layer(vo.diag_theta_l2(rho, rt))
        e = eul.energetics_ec(velx, w, rho, rt, st[4])
        tot = e["keh"] + e["kev"] + e["pe"] + e["ie"]
        return (jnp.min(thp), jnp.max(jnp.abs(vo.phys_int(w))),
                tot, e["kev"], jnp.min(vo.phys_layer(rho)))

    if ec:
        state = eul.init_state_ec(*state0[:5])
        state, aux = eul.step_ec(state, first=True)

        def chunk_fn(st, n):
            def body(s, _):
                s, aux = eul._step_ec_impl(*s, jnp.asarray(False))
                return s, diags(s) + (aux["newton_norms"],)
            return jax.lax.scan(body, st, None, length=n)
    else:
        state = state0[:5] + (state0[0],)
        state = eul._step(*state, jnp.asarray(True))

        def chunk_fn(st, n):
            def body(s, _):
                s = eul._step_impl(*s, jnp.asarray(False))
                return s, diags(s) + (jnp.zeros((4,)),)
            return jax.lax.scan(body, st, None, length=n)

    run = jax.jit(chunk_fn, static_argnums=1)
    step = 1
    t0 = time.time()
    while step < nsteps:
        n = min(chunk, nsteps - step)
        state, (thmin, wmax, etot, ekev, rhomin, nrm) = run(state, n)
        jax.block_until_ready(state[0])
        step += n
        i = int(np.argmin(np.asarray(thmin)))
        nr = np.asarray(nrm[-1])
        e0, e1 = float(etot[0]), float(etot[-1])
        print(f"[{time.strftime('%H:%M:%S')}] step {step} "
              f"({step/(time.time()-t0):.2f} st/s)  "
              f"min_th {float(thmin[-1]):.2f} (chunk-min {float(thmin[i]):.2f})"
              f"  max_w {float(wmax[-1]):.3e}"
              f"  dE/E {(e1 - e0) / abs(e0):+.3e}  kev {float(ekev[-1]):.3e}"
              f"  min_rho {float(rhomin[-1]):.4f}"
              f"  |d|(pi,w,rho,eta) {nr[0]:.1e} {nr[1]:.1e} {nr[2]:.1e}"
              f" {nr[3]:.1e}", flush=True)
        if not np.isfinite(float(thmin[-1])):
            # locate the first bad step inside the chunk
            bad = int(np.argmax(~np.isfinite(np.asarray(thmin))))
            print(f"!! NaN inside chunk at step ~{step - n + bad + 1}",
                  flush=True)
            break
        # locate the current theta minimum (level, element)
        thp = np.asarray(vo.phys_layer(vo.diag_theta_l2(state[2], state[3])))
        lev, el, q = np.unravel_index(np.argmin(thp), thp.shape)
        wv = np.asarray(state[1])
        wl, we, wq_ = np.unravel_index(np.argmax(np.abs(wv)), wv.shape)
        print(f"    th_min at lev={lev} el={el}; |w|_max at int={wl} el={we}"
              f" = {wv[wl, we, wq_]:.3e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
