#!/usr/bin/env python
"""3D rising warm bubble in the doubly-periodic box, reference scale.

Reference configuration (box/Bubble.cpp:24-32,135-137): NK=150 uniform
levels to 1500 m, +0.25 K bubble at z=350 m, dt=0.01 s, 400 s (40,000
steps).  The diagnostic is the theta' rise: the bubble ascends and rolls
up into the classic mushroom by t=400 s (plot the series with
scr/plot_bubble.py and the final y-midplane cross-section with
scr/plot_cross_section.py --field theta).

Hardened like demo/run_held_suarez.py: scanned sub-chunks, checkpoint after
every synced sub-chunk, self-tuning dispatch length, NaN abort (exit 42).

Usage: python demo/run_bubble.py [outdir] [ne] [nk] [seconds] [dt] [dump_s]
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

from mimsem_tpu.utils import io as mio


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "demo/bubble"
    ne = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nk = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    seconds = float(sys.argv[4]) if len(sys.argv) > 4 else 400.0
    dt = float(sys.argv[5]) if len(sys.argv) > 5 else 0.01
    dump_s = float(sys.argv[6]) if len(sys.argv) > 6 else 50.0
    nsteps = int(round(seconds / dt))
    dump_every = max(1, min(int(round(dump_s / dt)), nsteps // 2))
    os.makedirs(outdir, exist_ok=True)

    from mimsem_tpu.testcases import bubble as bb
    t0 = time.time()
    eul, state = bb.build(ne=ne, p=3, nk=nk, dt=dt, dtype=jnp.float32)
    state = state[:5] + (state[0],)          # plain Strang extended state
    ndofs = (eul.ops.ln1 + 3 * eul.ops.ln2) * nk
    print(f"build {time.time()-t0:.1f}s  ne={ne} nk={nk} dofs={ndofs}",
          flush=True)

    skeys = ("velx", "w", "rho", "rt", "exner", "velx_prev")
    ckpt_path = os.path.join(outdir, "checkpoint.npz")
    t_run = 0.0
    if os.path.exists(ckpt_path):
        cstep, f = mio.load_checkpoint(ckpt_path)
        f = mio.migrate_velx_flux(f, eul.vo)
        state = tuple(jnp.asarray(f[k], eul.ops.dtype) for k in skeys)
        t_run = float(f["t_run"]) if "t_run" in f else 0.0
        step = cstep
        print(f"resumed from {ckpt_path} at step {step}", flush=True)
        if step >= nsteps:
            print(f"run already complete ({step}/{nsteps} steps)", flush=True)
            return
    else:
        t0 = time.time()
        state = eul.step(state, first=True)
        jax.block_until_ready(state[0])
        t_run += time.time() - t0
        step = 1
        mio.save_checkpoint(ckpt_path, step, **dict(zip(skeys, state)),
                            t_run=np.float64(t_run))

    run = jax.jit(eul.run_steps, static_argnums=1)
    vo = eul.vo

    @jax.jit
    def bubble_diag(rho, rt, w):
        """(max theta', height of the theta' centroid, max |w|)."""
        thp = vo.phys_layer(vo.diag_theta_l2(rho, rt)) - bb.THETA_0
        thp = jnp.maximum(thp, 0.0)
        zmid = 0.5 * (vo.levs[:-1] + vo.levs[1:])
        zc = jnp.sum(thp * zmid) / jnp.maximum(jnp.sum(thp), 1e-12)
        return (jnp.max(thp), zc, jnp.max(jnp.abs(vo.phys_int(w))))

    mass_fn = jax.jit(lambda rho: jnp.sum(vo.interp(rho) * vo.Wq))
    mass0 = float(mass_fn(state[2]))
    max_chunk = int(os.environ.get("BUBBLE_MAX_CHUNK", "200"))
    marker = os.path.join(outdir, "tuner.json")
    try:
        with open(marker) as fh:
            m = json.load(fh)
        if m["step"] >= step:
            max_chunk = max(6, m["chunk"] // 2)
        elif step - m["step"] >= dump_every:
            max_chunk = min(1000, m["chunk"] * 2)
        else:
            max_chunk = m["chunk"]
    except Exception:
        pass
    with open(marker, "w") as fh:
        json.dump(dict(step=step, chunk=max_chunk), fh)
    print(f"sub-chunk {max_chunk} steps", flush=True)
    t_saved = 0.0
    while step < nsteps:
        chunk = min(dump_every - (step % dump_every) or dump_every,
                    nsteps - step)
        t0 = time.time()
        done = 0
        while done < chunk:
            sub = min(chunk - done, max_chunk)
            state, aux = run(state, sub)
            done += sub
            jax.block_until_ready(state[0])
            thmax, zc, wm = (float(x) for x in
                             bubble_diag(state[2], state[3], state[1]))
            print(f"  [{time.strftime('%H:%M:%S')}] step {step + done}  "
                  f"{(step + done) / (t_run + time.time() - t0):.2f} steps/s"
                  f"  th' {thmax:.3f} K @ z={zc:.0f} m  |w| {wm:.3f}",
                  flush=True)
            if not np.isfinite(wm):
                mio.save_checkpoint(
                    os.path.join(outdir, "nan_state.npz"), step + done,
                    **dict(zip(skeys, state)))
                print(f"!! NaN at step {step + done}; aborting", flush=True)
                sys.exit(42)
            if step + done < nsteps and time.time() - t_saved > 20.0:
                t_saved = time.time()
                mio.save_checkpoint(
                    ckpt_path, step + done, **dict(zip(skeys, state)),
                    t_run=np.float64(t_run + time.time() - t0))
        t_run += time.time() - t0
        step += chunk
        if step % dump_every == 0:
            velx, w, rho, rt, exner = state[:5]
            thmax, zc, wm = (float(x) for x in bubble_diag(rho, rt, w))
            m = float(mass_fn(rho))
            with open(os.path.join(outdir, "series.dat"), "a") as f:
                f.write(f"{step*dt:.6e}\t{thmax:.6e}\t{zc:.6e}\t{wm:.6e}\t"
                        f"{(m-mass0)/mass0:+.6e}\n")
            print(f"t={step*dt:.0f}s  th'max {thmax:.3f} K @ z={zc:.0f} m  "
                  f"mass drift {(m-mass0)/mass0:+.2e}", flush=True)
            dump = step // dump_every
            mio.write_layers(eul.ops, eul.vo,
                             dict(rho=("layer", rho), w=("interface", w),
                                  theta=("layer",
                                         eul.vo.diag_theta_l2(rho, rt)),
                                  u=("u1", velx)), dump, outdir)
            mio.save_checkpoint(ckpt_path, step, **dict(zip(skeys, state)),
                                t_run=np.float64(t_run))

    print(f"\n== {seconds} s, {nsteps} steps, wall {t_run:.0f}s "
          f"({nsteps/max(t_run,1e-9):.2f} steps/s)", flush=True)
    with open(os.path.join(outdir, "summary.txt"), "w") as f:
        f.write(f"ne={ne} nk={nk} seconds={seconds} dt={dt} steps={nsteps} "
                f"wall={t_run:.0f}s steps_per_s={nsteps/max(t_run,1e-9):.3f}\n")


if __name__ == "__main__":
    main()
