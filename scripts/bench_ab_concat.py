"""Focused concat-DSS A/B on the north-star SW configs (one process, both
modes per config so builds share the process)."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mimsem_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

def bench(ne, concat, steps=10):
    os.environ["MIMSEM_CONCAT_DSS"] = "1" if concat else "0"
    from mimsem_tpu.testcases import galewsky
    sw, u, h = galewsky.build(ne=ne, p=3, dt=360.0, dtype=jnp.float32)
    assert sw.ops.concat_dss == concat
    run = jax.jit(sw.run_steps, static_argnums=2)
    out = run(u, h, steps); jax.block_until_ready(out)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(u, h, steps); jax.block_until_ready(out)
        best = max(best, steps / (time.perf_counter() - t0))
    return best

for ne in (24, 48):
    a = bench(ne, False)
    b = bench(ne, True)
    print(json.dumps(dict(ne=ne, slice_sps=round(a,2), concat_sps=round(b,2),
                          speedup=round(b/a, 3))), flush=True)
