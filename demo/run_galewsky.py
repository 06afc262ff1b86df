#!/usr/bin/env python
"""20-day Galewsky barotropic-instability production run on TPU.

The reference flagship 2D configuration (src/Galewsky.cpp:84-90,152):
deg-3 basis, dt=360 s, 4800 steps (20 days), dump once per day, 2 Picard
iterations per step.  f32 on TPU with the mixed-precision machinery
(perturbation depth + f64 balanced forcing + Kahan accumulation); each day
(240 steps) is one on-device lax.scan dispatch, conservation is measured
host-side in f64 at every dump.

Usage: python demo/run_galewsky.py [outdir] [ne] [days] [--q-block]

--q-block switches the PV diagnosis to the exact-enstrophy 2x2 block solve
(SWEqn::diagnose_q_exact, src/SWEqn_Picard.cpp:1361-1478): enstrophy is then
conserved to solver tolerance instead of drifting under upwinded-PV
dissipation -- the conservation.dat enst column is the oracle.
"""
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

from mimsem_tpu.testcases import galewsky
from mimsem_tpu.utils import io as mio


def main():
    q_block = "--q-block" in sys.argv
    # --f64: full-precision science run (CPU; TPU f64 is emulated/slow) --
    # conservation oracles then sit at solver tolerance instead of f32 noise
    f64 = "--f64" in sys.argv
    if f64:
        jax.config.update("jax_enable_x64", True)
    # Picard iterations (reference production: 2).  The q_block total-energy
    # oracle is Picard-convergence-limited (DESIGN.md): 4-6 iterations take
    # the 5-day f64 energy drift from ~1e-6 to ~1e-10.
    nits = int(os.environ.get("MIMSEM_SW_NITS", "2"))
    argv = [a for a in sys.argv if not a.startswith("--")]
    outdir = argv[1] if len(argv) > 1 else "demo/galewsky"
    ne = int(argv[2]) if len(argv) > 2 else 24
    days = int(argv[3]) if len(argv) > 3 else 20
    dt = 360.0
    steps_per_day = int(round(86400.0 / dt))
    os.makedirs(outdir, exist_ok=True)

    t0 = time.time()
    sw, u, hp = galewsky.build(ne=ne, p=3, dt=dt,
                               dtype=jnp.float64 if f64 else jnp.float32,
                               q_block=q_block, nits=nits)
    if q_block:
        print("PV: exact-enstrophy 2x2 block solve (q_block)", flush=True)
    print(f"build {time.time()-t0:.1f}s  ndofs={sw.ops.n1 + sw.ops.n2}", flush=True)

    run_day = jax.jit(sw.run_steps_compensated, static_argnums=4)
    cu, ch = jnp.zeros_like(u), jnp.zeros_like(hp)
    c0 = sw.conservation_f64(u, hp, cu, ch)
    hdr = ["mass", "vort", "ener", "enst"]
    t_run = 0.0
    for day in range(1, days + 1):
        t0 = time.time()
        u, hp, cu, ch = run_day(u, hp, cu, ch, steps_per_day)
        jax.block_until_ready(u)
        t_run += time.time() - t0
        c = sw.conservation_f64(u, hp, cu, ch)
        drifts = {
            "mass": (c["mass"] - c0["mass"]) / c0["mass"],
            "vort": c["vort"] - c0["vort"],
            "ener": (c["ener"] - c0["ener"]) / c0["ener"],
            "enst": (c["enst"] - c0["enst"]) / c0["enst"],
        }
        mio.append_conservation(os.path.join(outdir, "conservation.dat"),
                                day * 86400.0, drifts, header=hdr)
        w = sw.curl(u)
        mio.write0(sw.ops, w, "vorticity", day, outdir)
        mio.write2(sw.ops, sw.h_full(hp), "pressure", day, outdir)
        mio.save_checkpoint(os.path.join(outdir, f"restart_{day:04d}.npz"),
                            day * steps_per_day, u=u, h=hp, cu=cu, ch=ch)
        print(f"day {day}/{days}  wall {time.time()-t0:.1f}s  "
              f"mass {drifts['mass']:.3e}  ener {drifts['ener']:.3e}", flush=True)
    sps = days * steps_per_day / t_run
    print(f"total run wall {t_run:.1f}s  {sps:.2f} steps/s  "
          f"{(sw.ops.n1 + sw.ops.n2) * sps:.3e} DOF*steps/s", flush=True)


if __name__ == "__main__":
    main()
