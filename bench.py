#!/usr/bin/env python
"""Headline benchmark: DOF-steps/sec on the Galewsky SWE configuration.

Runs the reference's flagship 2D configuration (deg-3 basis, dt=360 s,
2 Picard iterations/step, src/Galewsky.cpp:84-90,152) on the available
accelerator and prints one JSON line:
  {"metric": "dof_steps_per_sec", "value": N, "unit": "DOF*steps/s", "vs_baseline": R}

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
measured against the anchor recorded in BENCH_ANCHOR (the round-1 result), so
the series tracks self-improvement.
"""
import json
import os
import sys
import time

# On TPU, f64 is emulated and slow; the benchmark uses f32 compute with the
# science path (f64) validated separately in tests/.
import jax
import jax.numpy as jnp

BENCH_ANCHOR = 4.62e5  # DOF*steps/s, round-1 TPU v5e measurement (local-form DSS backend)


def main():
    ne = int(os.environ.get("BENCH_NE", "24"))
    p = int(os.environ.get("BENCH_P", "3"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    from mimsem_tpu.testcases import galewsky

    sw, u, h = galewsky.build(ne=ne, p=p, dt=360.0, dtype=jnp.float32)
    ndofs = sw.ops.n1 + sw.ops.n2

    # warmup/compile (single scanned dispatch covers all steps)
    run = jax.jit(sw.run_steps, static_argnums=2)
    u1, h1 = run(u, h, steps)
    jax.block_until_ready((u1, h1))

    t0 = time.perf_counter()
    u1, h1 = run(u, h, steps)
    jax.block_until_ready((u1, h1))
    dt_wall = time.perf_counter() - t0

    sps = steps / dt_wall
    value = ndofs * sps

    # secondary: 3D baroclinic Euler (UMJS14 config family, reduced size for
    # the bench window; full config is ne=48/4-equivalent, nk=30)
    euler = {}
    try:
        ne3 = int(os.environ.get("BENCH_NE3", "6"))
        nk3 = int(os.environ.get("BENCH_NK3", "16"))
        steps3 = int(os.environ.get("BENCH_STEPS3", "5"))
        from mimsem_tpu.testcases import umjs14
        eul, state = umjs14.build(ne=ne3, p=p, nk=nk3, dt=75.0,
                                  dtype=jnp.float32)
        state, _ = eul.step_ec(state, first=True)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(steps3):
            state, _ = eul.step_ec(state)
        jax.block_until_ready(state)
        sps3 = steps3 / (time.perf_counter() - t0)
        nd3 = (eul.ops.ln1 + 3 * eul.ops.ln2) * nk3
        euler = {"euler3d_dof_steps_per_sec": nd3 * sps3,
                 "euler3d_steps_per_sec": sps3,
                 "euler3d_ne": ne3, "euler3d_nk": nk3}
    except Exception as e:  # never fail the headline metric
        euler = {"euler3d_error": repr(e)[:200]}

    out = {
        "metric": "dof_steps_per_sec",
        "value": value,
        "unit": "DOF*steps/s",
        "vs_baseline": value / BENCH_ANCHOR,
        "config": {"case": "galewsky", "ne": ne, "p": p, "ndofs": ndofs,
                   "steps_per_sec": sps, "device": str(jax.devices()[0]),
                   "dtype": "float32", **euler},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
