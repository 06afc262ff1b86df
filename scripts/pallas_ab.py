#!/usr/bin/env python
"""A/B: slicing DSS vs single-launch Pallas DSS on the real TPU.

The roofline (scripts/roofline.py) shows 66-80% of device time in
dynamic-update-slice kernels, dominated by the DSS slicing cores; the Pallas
variant (ops/local_form.py _pallas_dss) runs the identical slicing code
in-register as ONE kernel launch.  This measures both paths at the bench
configs and checks numerical equivalence on the stepped state.

Usage: timeout 1800 python scripts/pallas_ab.py [sw|ec ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mimsem_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def bench_sw(pallas, steps=10, ne=24):
    os.environ["MIMSEM_PALLAS_DSS"] = "1" if pallas else "0"
    from mimsem_tpu.testcases import galewsky
    sw, u, h = galewsky.build(ne=ne, p=3, dt=360.0, dtype=jnp.float32)
    run = jax.jit(sw.run_steps, static_argnums=2)
    t0 = time.perf_counter()
    out = run(u, h, steps)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = run(u, h, steps)
    jax.block_until_ready(out)
    dt_wall = time.perf_counter() - t0
    return dict(steps_per_sec=steps / dt_wall, compile_s=t_compile,
                state=tuple(np.asarray(x) for x in out))


def bench_ec(pallas, steps=5):
    os.environ["MIMSEM_PALLAS_DSS"] = "1" if pallas else "0"
    from mimsem_tpu.testcases import umjs14
    eul, st = umjs14.build(ne=6, p=3, nk=16, dt=75.0, dtype=jnp.float32)
    st, _ = eul.step_ec(st, first=True)
    run = jax.jit(eul.run_steps_ec, static_argnums=1)
    t0 = time.perf_counter()
    out, _ = run(st, steps)
    jax.block_until_ready(out[0])
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, _ = run(st, steps)
    jax.block_until_ready(out[0])
    dt_wall = time.perf_counter() - t0
    return dict(steps_per_sec=steps / dt_wall, compile_s=t_compile,
                state=tuple(np.asarray(x) for x in out))


def relerr(a, b):
    return max(float(np.max(np.abs(x - y)) /
                     (np.max(np.abs(x)) + 1e-300))
               for x, y in zip(a, b))


def main():
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or ["sw", "ec"]
    res = {}
    for w in which:
        # sw48: the BASELINE.md north-star 2D config, measured for the
        # roofline story (the enable gate in scripts/tpu_stage2.sh reads
        # only the sw/ec pair)
        if w == "sw48":
            f = lambda p: bench_sw(p, ne=48)
        else:
            f = bench_sw if w == "sw" else bench_ec
        a = f(False)
        print(f"{w} slicing: {a['steps_per_sec']:.2f} steps/s "
              f"(compile {a['compile_s']:.0f}s)", flush=True)
        b = f(True)
        print(f"{w} pallas:  {b['steps_per_sec']:.2f} steps/s "
              f"(compile {b['compile_s']:.0f}s)", flush=True)
        err = relerr(a["state"], b["state"])
        res[w] = dict(slicing_sps=a["steps_per_sec"],
                      pallas_sps=b["steps_per_sec"],
                      speedup=b["steps_per_sec"] / a["steps_per_sec"],
                      state_relerr=err)
        print(f"{w} speedup {res[w]['speedup']:.2f}x  state relerr {err:.2e}",
              flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
