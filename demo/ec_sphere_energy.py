"""f64 energy-conservation audit of the EC step on the SPHERE.

The EC budget-closure oracle (tests/test_euler3d.py::test_ec_budget_closure_f64)
runs on the periodic box -- no Coriolis, no curvature.  Both production
blowups (UMJS14 day 2.8, unforced Held-Suarez step ~350) are on the sphere,
so this drives the unforced Held-Suarez state through step_ec in f64 on CPU
and prints the per-step total-energy drift and budget closure.  A growing
dEtot pins a sphere-specific anti-dissipative term; a closed budget says the
scheme is EC on the sphere too and the blowup is a resolution/stability
issue instead.

Usage: ec_sphere_energy.py [nsteps] [ne] [nk] [dt] [variant]
variant: 'ec' (default) | 'strang'
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_ENABLE_X64", "1")
import jax
import jax.numpy as jnp

import numpy as np


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    ne = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nk = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    dt = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0
    variant = sys.argv[5] if len(sys.argv) > 5 else "ec"

    from mimsem_tpu.testcases import held_suarez
    eul, st5 = held_suarez.build(ne=ne, p=3, nk=nk, dt=dt, dtype=jnp.float64)
    eul.hs_forcing = False          # unforced: any energy growth is a bug
    print(f"ne={ne} nk={nk} dt={dt} variant={variant} "
          f"x64={jax.config.jax_enable_x64}", flush=True)

    if variant == "ec":
        st = eul.init_state_ec(*st5[:5])
    else:
        st = st5[:5] + (st5[0],)

    e_prev = None
    for i in range(nsteps):
        if variant == "ec":
            st, aux = eul.step_ec(st, first=(i == 0))
            exch = dt * float(aux["k2i"] + aux["k2i_z"])
        else:
            st = eul.step(st, first=(i == 0))
            exch = float("nan")
        e = {k: float(v) for k, v in eul.energetics_ec(*st[:5]).items()}
        tot = e["keh"] + e["kev"] + e["pe"] + e["ie"]
        line = (f"[{i:3d}] keh {e['keh']:.6e} kev {e['kev']:.3e} "
                f"ie {e['ie']:.10e}")
        if e_prev is not None:
            die = e["ie"] - e_prev["tot_ie"]
            detot = tot - e_prev["tot"]
            line += (f"  dEtot/E {detot / abs(tot):+.3e}"
                     f"  closure {(die - exch) / (abs(die) + 1e-300):+.3e}")
        e_prev = dict(tot=tot, tot_ie=e["ie"])
        print(line, flush=True)


if __name__ == "__main__":
    main()
