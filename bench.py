#!/usr/bin/env python
"""Headline benchmark: DOF-steps/sec on the Galewsky SWE configuration.

Runs the reference's flagship 2D configuration (deg-3 basis, dt=360 s,
2 Picard iterations/step, src/Galewsky.cpp:84-90,152) on the available
accelerator and prints one JSON line:
  {"metric": "dof_steps_per_sec", "value": N, "unit": "DOF*steps/s", "vs_baseline": R}

The reference publishes no throughput numbers and cannot be built in this
container (no PETSc/MPI/HDF5 toolchain and no network egress -- see
BASELINE.md "Measured baseline anchor").  vs_baseline is therefore anchored
to a MEASURED matched-config proxy: this framework's own Galewsky step at
reference numerics (float64, deg-3, dt=360, 2 Picard its) timed on one host
CPU core (`python bench.py --cpu-proxy`, committed in BASELINE_PROXY.json),
scaled by REF_NODE_CORES=48 assuming perfect MPI scaling -- i.e. a
GENEROUSLY-estimated 48-core CPU node running the same numerics.
vs_baseline = one-TPU-chip throughput / that node estimate.  The round-1
self-anchor is still reported as vs_round1 for series continuity.

The headline stays at ne=24 for series comparability; the BASELINE.md
north-star configs (2D ne=48; 3D nk=30) are measured alongside with
XLA-reported FLOP counts and an MFU estimate.

Env knobs: BENCH_NE/BENCH_P/BENCH_STEPS (headline), BENCH_PROD=0 to skip the
production-scale configs, BENCH_PROFILE=1 to dump a jax.profiler trace.
"""
import json
import os
import sys
import time

# On TPU, f64 is emulated and slow; the benchmark uses f32 compute with the
# science path (f64) validated separately in tests/.
import jax
# persistent compile cache: the tunneled TPU's remote-compile endpoint is
# intermittently flaky, and a cold bench recompile is ~10 min of exposure;
# cached executables make reruns (and the end-of-round driver run) robust
jax.config.update("jax_compilation_cache_dir", "/tmp/mimsem_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

BENCH_ANCHOR = 4.62e5  # DOF*steps/s, round-1 TPU v5e measurement (local-form DSS backend)
PEAK_BF16 = 1.97e14    # TPU v5e (v5 lite) peak bf16 FLOP/s per chip
REF_NODE_CORES = 48    # reference production node (NCI gadi, 2x24-core CLX)
PROXY_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BASELINE_PROXY.json")


def _flops_per_call(jitted, *args):
    """XLA-reported FLOP count of one call (cost analysis of the compiled
    executable; the profiling hook of SURVEY.md section 5)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_sw(ne, p, steps, profile=False):
    from mimsem_tpu.testcases import galewsky
    sw, u, h = galewsky.build(ne=ne, p=p, dt=360.0, dtype=jnp.float32)
    ndofs = sw.ops.n1 + sw.ops.n2
    run = jax.jit(sw.run_steps, static_argnums=2)
    u1, h1 = run(u, h, steps)
    jax.block_until_ready((u1, h1))
    if profile:
        jax.profiler.start_trace("/tmp/mimsem_trace")
    t0 = time.perf_counter()
    u1, h1 = run(u, h, steps)
    jax.block_until_ready((u1, h1))
    dt_wall = time.perf_counter() - t0
    if profile:
        jax.profiler.stop_trace()
        print("profile trace: /tmp/mimsem_trace", file=sys.stderr)
    # second repetition: run-to-run jitter on the tunneled chip is ~5%
    # (round-4 ne=6/nk=16 26.4 vs 28.1 steps/s ambiguity); report best-of-2
    # plus both samples so regressions are distinguishable from noise
    t1 = time.perf_counter()
    u1, h1 = run(u, h, steps)
    jax.block_until_ready((u1, h1))
    reps = [steps / dt_wall, steps / (time.perf_counter() - t1)]
    sps = max(reps)
    flops = _flops_per_call(run, u, h, steps) / steps
    return dict(ndofs=ndofs, steps_per_sec=sps, steps_per_sec_reps=reps,
                dof_steps_per_sec=ndofs * sps,
                flops_per_step=flops, flops_per_sec=flops * sps,
                mfu_bf16=flops * sps / PEAK_BF16)


def bench_euler(ne, nk, p, steps, dt=75.0):
    """EC Euler through the production path: run_steps_ec, ONE lax.scan
    dispatch for the whole window (per-step python dispatch costs ~0.5 s
    over a tunneled TPU and was under-reporting the sustained rate)."""
    from mimsem_tpu.testcases import umjs14
    eul, state = umjs14.build(ne=ne, p=p, nk=nk, dt=dt, dtype=jnp.float32)
    run = jax.jit(eul.run_steps_ec, static_argnums=1)
    state, _ = eul.step_ec(state, first=True)
    state, _ = run(state, steps)          # compile + warm
    jax.block_until_ready(state[0])
    reps = []
    for _ in range(2):                      # best-of-2 (see bench_sw note)
        t0 = time.perf_counter()
        state, _ = run(state, steps)
        jax.block_until_ready(state[0])
        reps.append(steps / (time.perf_counter() - t0))
    sps = max(reps)
    nd = (eul.ops.ln1 + 3 * eul.ops.ln2) * nk
    flops = _flops_per_call(run, state, steps) / steps
    return dict(ne=ne, nk=nk, ndofs=nd, steps_per_sec=sps,
                steps_per_sec_reps=reps,
                dof_steps_per_sec=nd * sps, flops_per_step=flops,
                flops_per_sec=flops * sps, mfu_bf16=flops * sps / PEAK_BF16)


def cpu_proxy():
    """Measure the matched-config reference-numerics proxy on ONE CPU core
    and write BASELINE_PROXY.json.  Run as
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          taskset -c 0 python bench.py --cpu-proxy
    (the scrubbed env keeps the axon hook from registering the TPU)."""
    jax.config.update("jax_enable_x64", True)
    from mimsem_tpu.testcases import galewsky
    sw, u, h = galewsky.build(ne=24, p=3, dt=360.0, dtype=jnp.float64)
    ndofs = sw.ops.n1 + sw.ops.n2
    run = jax.jit(sw.run_steps, static_argnums=2)
    steps = int(os.environ.get("BENCH_STEPS", "6"))
    u1, h1 = run(u, h, steps)
    jax.block_until_ready((u1, h1))
    t0 = time.perf_counter()
    u1, h1 = run(u, h, steps)
    jax.block_until_ready((u1, h1))
    sps = steps / (time.perf_counter() - t0)
    out = dict(
        kind="cpu_proxy_per_core",
        meaning=("matched-config Galewsky (ne=24 deg-3 dt=360 f64, reference "
                 "numerics) on one host CPU core; the reference C++ itself "
                 "is unbuildable here (no PETSc/MPI/HDF5, no egress)"),
        device=str(jax.devices()[0]), dtype="float64", ne=24, p=3,
        ndofs=ndofs, steps_per_sec=sps, dof_steps_per_sec=ndofs * sps,
        ref_node_cores=REF_NODE_CORES)
    with open(PROXY_FILE, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def main():
    ne = int(os.environ.get("BENCH_NE", "24"))
    p = int(os.environ.get("BENCH_P", "3"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    profile = os.environ.get("BENCH_PROFILE", "0") == "1"
    do_prod = os.environ.get("BENCH_PROD", "1") == "1"

    head = bench_sw(ne, p, steps, profile=profile)

    extras = {}
    # secondary: 3D baroclinic Euler (EC scheme), bench-window size
    try:
        extras["euler3d"] = bench_euler(
            int(os.environ.get("BENCH_NE3", "6")),
            int(os.environ.get("BENCH_NK3", "16")), p,
            int(os.environ.get("BENCH_STEPS3", "5")))
    except Exception as e:
        extras["euler3d_error"] = repr(e)[:200]
    # production / north-star configs (BASELINE.md: 2D ne=48; 3D nk=30)
    if do_prod:
        try:
            extras["prod_sw_ne48"] = bench_sw(48, p, max(4, steps // 2))
        except Exception as e:
            extras["prod_sw_error"] = repr(e)[:200]
        try:
            extras["prod_euler_nk30"] = bench_euler(
                int(os.environ.get("BENCH_NE3P", "12")), 30, p, 3)
        except Exception as e:
            extras["prod_euler_error"] = repr(e)[:200]

    # baseline: measured CPU proxy (BASELINE_PROXY.json) x ref node cores;
    # falls back to the round-1 self-anchor if the proxy file is absent
    vs_meaning = "vs round-1 self-anchor (no proxy file)"
    vs = head["dof_steps_per_sec"] / BENCH_ANCHOR
    if os.path.exists(PROXY_FILE):
        with open(PROXY_FILE) as f:
            proxy = json.load(f)
        node = proxy["dof_steps_per_sec"] * proxy.get("ref_node_cores",
                                                      REF_NODE_CORES)
        vs = head["dof_steps_per_sec"] / node
        vs_meaning = ("one v5e chip vs a %d-core CPU node running matched-"
                      "config f64 (measured per-core proxy x perfect MPI "
                      "scaling; reference C++ unbuildable here -- see "
                      "BASELINE.md)" % proxy.get("ref_node_cores",
                                                 REF_NODE_CORES))
    out = {
        "metric": "dof_steps_per_sec",
        "value": head["dof_steps_per_sec"],
        "unit": "DOF*steps/s",
        # flops_per_step / mfu_bf16 come from XLA cost analysis of the
        # executable compiled at HEAD, so they move whenever the compiled
        # graph changes (round 3 -> 4: 24.8M -> 26.4M for sw24); only
        # steps_per_sec / dof_steps_per_sec are round-comparable series
        "flops_model": "xla_cost_analysis_of_HEAD_executable",
        "vs_baseline": vs,
        "vs_baseline_meaning": vs_meaning,
        "vs_round1": head["dof_steps_per_sec"] / BENCH_ANCHOR,
        "config": {"case": "galewsky", "ne": ne, "p": p,
                   "ndofs": head["ndofs"],
                   "steps_per_sec": head["steps_per_sec"],
                   "flops_per_step": head["flops_per_step"],
                   "mfu_bf16": head["mfu_bf16"],
                   "device": str(jax.devices()[0]),
                   "dtype": "float32", **extras},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--cpu-proxy" in sys.argv:
        cpu_proxy()
    else:
        try:
            main()
        except Exception:
            # the tunneled TPU intermittently kills dispatches with
            # UNAVAILABLE errors that poison the whole in-process backend;
            # a bounded self-re-exec gives the end-of-round driver run a
            # fresh client instead of recording a one-off infra fault
            import traceback
            n = int(os.environ.get("BENCH_RETRY", "0"))
            traceback.print_exc(file=sys.stderr)
            if n >= 2:
                raise
            os.environ["BENCH_RETRY"] = str(n + 1)
            print(f"bench: retrying after failure ({n + 1}/2) in 60 s",
                  file=sys.stderr, flush=True)
            time.sleep(60)
            os.execv(sys.executable, [sys.executable] + sys.argv)
