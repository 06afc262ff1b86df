"""Time-loop drivers: the analogue of the reference main() programs.

Each reference driver (src/Galewsky.cpp:81-160 etc.) follows the same shape:
build model + ICs (or restart from dump), record conservation baselines, loop
steps, dump fields + conservation at intervals.  `run_sw` / `run_tsw` factor
that shape; the testcases modules supply build().
"""
from __future__ import annotations

import os
import time

import numpy as np

from . import io as mio
from . import diagnostics as dg


def run_sw(sw, u, hp, nsteps, dump_every, outdir="output",
           start_step=0, error_norms=None, verbose=True, cu=None, ch=None,
           profile_dir=None):
    """Semi-implicit SW time loop with conservation monitoring
    (src/Galewsky.cpp:147-158, src/Williamson2.cpp:130-152).

    hp is the depth perturbation (see models/swe.py); steps use Kahan
    compensated accumulation (cu/ch carries, resumable from checkpoints) and
    conservation drift is measured host-side in f64.  profile_dir captures a
    jax.profiler device trace of the whole loop (utils/profiling.py)."""
    import contextlib
    import jax.numpy as jnp
    from .profiling import trace, PhaseTimer
    os.makedirs(outdir, exist_ok=True)
    if cu is None:
        cu, ch = jnp.zeros_like(u), jnp.zeros_like(hp)
    c0 = sw.conservation_f64(u, hp, cu, ch)
    hdr = ["mass", "vort", "ener", "enst"]
    dump = start_step // max(dump_every, 1)
    pt = PhaseTimer()
    ctx = trace(profile_dir) if profile_dir else contextlib.nullcontext()
    with ctx:
        for step in range(start_step + 1, nsteps + 1):
            t0 = time.time()
            with pt.phase("step", block_on=None):
                u, hp, cu, ch = sw._step_k(u, hp, cu, ch)
            if verbose:
                print(f"step {step}/{nsteps}  wall {time.time()-t0:.3f}s",
                      flush=True)
            if dump_every and step % dump_every == 0:
                dump += 1
                with pt.phase("dump", block_on=u):
                    w = sw.curl(u)
                    mio.write0(sw.ops, w, "vorticity", dump, outdir)
                    mio.write1(sw.ops, u, "velocity", dump, outdir)
                    mio.write2(sw.ops, sw.h_full(hp), "pressure", dump, outdir)
                    c = sw.conservation_f64(u, hp, cu, ch)
                    drifts = {
                        "mass": (c["mass"] - c0["mass"]) / c0["mass"],
                        "vort": c["vort"] - c0["vort"],
                        "ener": (c["ener"] - c0["ener"]) / c0["ener"],
                        "enst": (c["enst"] - c0["enst"]) / c0["enst"],
                    }
                    mio.append_conservation(
                        os.path.join(outdir, "conservation.dat"),
                        step * sw.dt, drifts, header=hdr)
                    mio.save_checkpoint(
                        os.path.join(outdir, f"restart_{dump:04d}.npz"),
                        step, u=u, h=hp, cu=cu, ch=ch)
                    if error_norms is not None:
                        norms = error_norms(sw, u, hp)
                        with open(os.path.join(outdir, "errors.dat"), "a") as f:
                            row = [step * sw.dt / 86400.0]
                            for k in ("w", "u", "h"):
                                row += [float(x) for x in np.asarray(norms[k])]
                            f.write("\t".join(f"{x:.16e}" for x in row) + "\n")
    if verbose and pt.acc:
        print("phases: " + pt.summary(), flush=True)
    return u, hp


def run_euler(eul, state, nsteps, dump_every, outdir="output", start_step=0,
              verbose=True):
    """3D Euler HEVI loop with energetics monitoring (the analogue of
    eul/UMJS14.cpp:334-353 + Euler::diagnostics -> energetics.dat)."""
    os.makedirs(outdir, exist_ok=True)
    e0 = {k: float(v) for k, v in eul.energetics(*state[:5]).items()}
    hdr = ["k_h", "k_v", "pe", "ie", "mass", "entr"]
    dump = start_step // max(dump_every, 1)
    first = (start_step == 0)
    for step in range(start_step + 1, nsteps + 1):
        t0 = time.time()
        state = eul.step(state, first=first)
        first = False
        if verbose:
            print(f"step {step}/{nsteps}  wall {time.time()-t0:.3f}s", flush=True)
        if dump_every and step % dump_every == 0:
            dump += 1
            velx, w, rho, rt, exner, _ = state
            e = {k: float(v) for k, v in eul.energetics(velx, w, rho, rt,
                                                        exner).items()}
            with open(os.path.join(outdir, "energetics.dat"), "a") as f:
                cols = [step * eul.dt / 86400.0] + [e[k] for k in hdr]
                f.write("\t".join(f"{c:.16e}" for c in cols) + "\n")
            mio.write_layers(eul.ops, eul.vo,
                             dict(rho=("layer", rho), rt=("layer", rt),
                                  exner=("layer", exner), w=("interface", w),
                                  theta=("layer",
                                         eul.vo.diag_theta_l2(rho, rt)),
                                  u=("u1", velx)), dump, outdir)
            mio.save_checkpoint(os.path.join(outdir, f"restart_{dump:04d}.npz"),
                                step, velx=velx, w=w, rho=rho, rt=rt,
                                exner=exner, velx_prev=state[5])
    return state


def run_euler_ec(eul, state, nsteps, dump_every, outdir="output", start_step=0,
                 verbose=True):
    """Entropy-conserving 3D Euler loop (Strang_ec) with the full 12-column
    energetics.dat of the reference (eul/Euler_2.cpp:716-733)."""
    os.makedirs(outdir, exist_ok=True)
    hdr = ["keh", "kev", "pe", "ie", "k2p", "p2k", "k2i", "i2k", "k2i_z",
           "i2k_z", "mass", "entr"]
    dump = start_step // max(dump_every, 1)
    first = (start_step == 0)
    for step in range(start_step + 1, nsteps + 1):
        t0 = time.time()
        state, aux = eul.step_ec(state, first=first)
        first = False
        if verbose:
            nn = np.asarray(aux["newton_norms"])
            print(f"step {step}/{nsteps}  wall {time.time()-t0:.3f}s  "
                  f"newton |dPi|/|Pi| {nn[0]:.2e}", flush=True)
        if dump_every and step % dump_every == 0:
            dump += 1
            velx, w, rho, rt, exner = state[:5]
            e = eul.energetics_ec(velx, w, rho, rt, exner,
                                  k2i=aux["k2i"], k2i_z=aux["k2i_z"])
            e = {k: float(v) for k, v in e.items()}
            with open(os.path.join(outdir, "energetics.dat"), "a") as f:
                cols = [step * eul.dt / 86400.0] + [e[k] for k in hdr]
                f.write("\t".join(f"{c:.16e}" for c in cols) + "\n")
            mio.write_layers(eul.ops, eul.vo,
                             dict(rho=("layer", rho), rt=("layer", rt),
                                  exner=("layer", exner), w=("interface", w),
                                  theta=("layer",
                                         eul.vo.diag_theta_l2(rho, rt)),
                                  u=("u1", velx)), dump, outdir)
            mio.save_checkpoint(os.path.join(outdir, f"restart_{dump:04d}.npz"),
                                step, velx=velx, w=w, rho=rho, rt=rt,
                                exner=exner, velx_prev=state[5],
                                uz_prev=state[6])
    return state


def run_tsw(tsw, u, h, S, nsteps, dump_every, outdir="output", start_step=0,
            verbose=True):
    """Thermal-SW (EEC, SSP-RK3) loop (src/GalewskyTSW_2.cpp:182-199)."""
    os.makedirs(outdir, exist_ok=True)
    c0 = {k: float(v) for k, v in tsw.conservation(u, h, S).items()}
    hdr = ["mass", "vort", "ener", "enst", "buoy", "entr"]
    dump = start_step // max(dump_every, 1)
    for step in range(start_step + 1, nsteps + 1):
        u, h, S = tsw.step(u, h, S)
        if verbose and step % 50 == 0:
            print(f"step {step}/{nsteps}", flush=True)
        if dump_every and step % dump_every == 0:
            dump += 1
            ops = tsw.ops
            w = tsw.curl(u)
            s = ops.solve_M2(ops.apply_M2(S), h2=h)
            mio.write0(ops, w, "vorticity", dump, outdir)
            mio.write1(ops, u, "velocity", dump, outdir)
            mio.write2(ops, h, "pressure", dump, outdir)
            mio.write2(ops, s, "buoyancy", dump, outdir)
            mio.write2(ops, S, "depth_buoyancy", dump, outdir)
            c = {k: float(v) for k, v in tsw.conservation(u, h, S).items()}
            drifts = {
                "mass": (c["mass"] - c0["mass"]) / c0["mass"],
                "vort": c["vort"] - c0["vort"],
                "ener": (c["ener"] - c0["ener"]) / c0["ener"],
                "enst": (c["enst"] - c0["enst"]) / c0["enst"],
                "buoy": (c["buoy"] - c0["buoy"]) / c0["buoy"],
                "entr": (c["entr"] - c0["entr"]) / c0["entr"],
            }
            mio.append_conservation(os.path.join(outdir, "conservation.dat"),
                                    step * tsw.dt, drifts, header=hdr)
            mio.save_checkpoint(os.path.join(outdir, f"restart_{dump:04d}.npz"),
                                step, u=u, h=h, S=S)
    return u, h, S
