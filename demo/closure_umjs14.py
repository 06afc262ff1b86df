#!/usr/bin/env python
"""Measure the EC energy-budget closure AT PRODUCTION SCALE.

Replays a short window from the committed day-12 UMJS14 checkpoint
(ne=12/p=3/nk=30, the flagship configuration) and closes the budget with
the measured channels:

  dIE    vs  dt*(k2i + k2i_z)          -- the KE<->IE exchange identity
  dE_tot vs -dt*(visc_p + ray_p)       -- the dissipation channels

The round-4 production budget reported `closure_worst = 0.72` for the
first identity with the second unmeasured ("truncation-dominated"
hypothesis).  This script turns both into measurements on the REAL
day-12 state (sharp fronts, breaking waves), not the quiet f64 bubble.
Reference budget: eul/Euler_2.cpp:600-744.

Writes demo/umjs14/closure.dat: one row per chunk,
  step  dKEh  dKEv  dPE  dIE  exch_int  diss_int  dEtot  explained_frac

Model runs in f32 (the production dtype); energetics integrals evaluate
in f64 (x64 enabled; see Euler3D.energetics_ec docstring).  On the TPU
this is ~2 min; CPU f64 fallback works but is slow.

Usage: python demo/closure_umjs14.py [nchunks] [chunk_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/mimsem_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from mimsem_tpu.utils import io as mio


def main():
    nchunks = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from mimsem_tpu.testcases import umjs14
    t0 = time.time()
    eul, _ = umjs14.build(ne=12, p=3, nk=30, dt=75.0, dtype=jnp.float32)
    print(f"build {time.time()-t0:.1f}s", flush=True)

    skeys = ("velx", "w", "rho", "rt", "exner", "velx_prev", "uz_prev")
    cstep, f = mio.load_checkpoint("demo/umjs14/checkpoint.npz")
    f = mio.migrate_velx_flux(f, eul.vo)
    state = tuple(jnp.asarray(f[k], eul.ops.dtype) for k in skeys)
    print(f"replaying from step {cstep} (day {cstep*75.0/86400:.1f})",
          flush=True)

    run = jax.jit(eul.run_steps_ec, static_argnums=1)
    en = lambda st: {k: float(v)
                     for k, v in eul.energetics_ec(*st[:5]).items()}
    e0 = en(state)
    out = os.path.join("demo/umjs14", "closure.dat")
    with open(out, "w") as fh:
        fh.write("# step dKEh dKEv dPE dIE exch_int diss_int dEtot "
                 "explained_frac dIE_closure\n")
    t0 = time.time()
    for i in range(nchunks):
        state, aux = run(state, chunk)
        jax.block_until_ready(state[0])
        e1 = en(state)
        d = {k: e1[k] - e0[k] for k in ("keh", "kev", "pe", "ie")}
        detot = sum(d.values())
        exch = float(aux["exch_int"])
        diss = float(aux["diss_int"])
        frac = -detot / diss if diss else float("nan")
        # dIE identity: the IE gained should be the exchange taken from KE
        die_cl = d["ie"] / exch if exch else float("nan")
        row = (cstep + (i + 1) * chunk, d["keh"], d["kev"], d["pe"],
               d["ie"], exch, diss, detot, frac, die_cl)
        with open(out, "a") as fh:
            fh.write("\t".join(f"{v:.10e}" if isinstance(v, float) else str(v)
                               for v in row) + "\n")
        print(f"[{time.strftime('%H:%M:%S')}] +{(i+1)*chunk} "
              f"({(i+1)*chunk/(time.time()-t0):.2f} st/s) "
              f"dEtot {detot:+.3e}  diss {diss:.3e}  "
              f"explained {frac:.3f}  dIE/exch {die_cl:.4f}", flush=True)
        e0 = e1
    print("done", flush=True)


if __name__ == "__main__":
    main()
