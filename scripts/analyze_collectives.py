#!/usr/bin/env python
"""Measure the communication footprint of the sharded SW step.

Compiles the Picard step over an n-device CPU mesh and walks the optimized
HLO counting collective ops (all-reduce / all-gather / collective-permute /
all-to-all) and their operand bytes.  Verifies the sharding-v2 requirement:
communicated bytes per step must be boundary-sized (element-strip halos +
scalar reductions), not volume-sized.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/analyze_collectives.py [ne] [p]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPE_RE = re.compile(r"(f32|f64|s32|u32|pred)\[([\d,]*)\]")
BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1}


def shape_bytes(text):
    total = 0
    m = SHAPE_RE.match(text.strip())
    if m:
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total = n * BYTES[dt]
    return total


def main(ne=2, p=3, n_devices=8):
    import jax
    jax.config.update("jax_enable_x64", True)
    from mimsem_tpu.parallel.sharding import make_mesh, element_sharding
    from mimsem_tpu.testcases import williamson2 as w2

    mesh = make_mesh(n_devices)
    el_sh = element_sharding(mesh)
    sw, u, h = w2.build(ne=ne, p=p, dt=600.0, el_sharding=el_sh,
                        gmres_restart=20, gmres_maxiter=2)
    lowered = jax.jit(sw._step_impl).lower(u, h)
    hlo = lowered.compile().as_text()

    counts = {}
    bytes_ = {}
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r".*= *([a-z0-9\-]+\[[^\]]*\][^ ]*) *"
                     r"(all-reduce|all-gather|collective-permute|all-to-all)"
                     r"(-start)?\(", ls)
        if not m:
            m2 = re.search(r"= *(\S+) +(all-reduce|all-gather|"
                           r"collective-permute|all-to-all)(-start)?\(", ls)
            if not m2:
                continue
            out_shape, kind = m2.group(1), m2.group(2)
        else:
            out_shape, kind = m.group(1), m.group(2)
        counts[kind] = counts.get(kind, 0) + 1
        bytes_[kind] = bytes_.get(kind, 0) + shape_bytes(
            out_shape.replace("(", "[").split("{")[0])

    state_bytes = (u.size + h.size) * u.dtype.itemsize
    print(f"ne={ne} p={p} devices={n_devices}  state={state_bytes/1e3:.1f} kB")
    total = 0
    for k in sorted(counts):
        print(f"  {k:20s} x{counts[k]:4d}   ~{bytes_.get(k,0)/1e3:.1f} kB")
        total += bytes_.get(k, 0)
    print(f"  total collective output bytes ~{total/1e3:.1f} kB "
          f"({total/max(state_bytes,1):.2f}x state)")
    # boundary size estimate: 1-form edge strips on every element boundary
    nel = sw.ops.nel
    strip = 4 * np.sqrt(nel / 6) * 6 * p * u.dtype.itemsize
    print(f"  (one face-boundary strip ~{strip/1e3:.2f} kB)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
