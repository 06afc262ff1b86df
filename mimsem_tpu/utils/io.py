"""Field output, conservation logs, and checkpoint/restart.

Parity with the reference's I/O:
  * write0/1/2 interpolate fields to quadrature points and dump them with
    coordinates (src/Geom.cpp:326-516 writes ASCII .dat + binary .vec; here a
    single compressed .npz per field with lon/lat + values, plus optional
    ASCII for the reference plotters).
  * conservation.dat / energetics.dat appenders
    (src/SWEqn_Picard.cpp:1348-1354, eul/Euler_2.cpp:716-733).
  * checkpoint(): the analogue of the reference's .vec dumps + startStep
    restart logic (src/Galewsky.cpp:88,120-130) -- one .npz of the state
    pytree + step counter.
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp


def _ensure(path):
    os.makedirs(path, exist_ok=True)
    return path


def write0(ops, u0, name, step, outdir="output", ascii_dat=False):
    """0-form field -> values at quadrature points."""
    vals = np.asarray(ops.interp0(u0))
    _write_field(ops, vals, name, step, outdir, ascii_dat)


def write1(ops, u1, name, step, outdir="output", ascii_dat=False):
    """1-form -> physical (zonal, meridional) components at quad points."""
    up = np.asarray(ops.interp1_phys(u1))
    _write_field(ops, up[..., 0], name + "_x", step, outdir, ascii_dat)
    _write_field(ops, up[..., 1], name + "_y", step, outdir, ascii_dat)


def write2(ops, u2, name, step, outdir="output", ascii_dat=False):
    vals = np.asarray(ops.interp2_phys(u2))
    _write_field(ops, vals, name, step, outdir, ascii_dat)


def _write_field(ops, vals, name, step, outdir, ascii_dat):
    _ensure(outdir)
    lonlat = np.asarray(ops.lonlat)
    fn = os.path.join(outdir, f"{name}_{step:04d}.npz")
    np.savez_compressed(fn, lon=lonlat[..., 0], lat=lonlat[..., 1], vals=vals)
    if ascii_dat:
        flat = np.stack([lonlat[..., 0].ravel(), lonlat[..., 1].ravel(),
                         vals.ravel()], axis=1)
        np.savetxt(os.path.join(outdir, f"{name}_{step:04d}.dat"), flat)


def write_layers(ops, vo, fields: dict, step, outdir="output"):
    """3D dump: physical values of layer/interface fields at quadrature points
    with coordinates, one .npz per step (the compact analogue of the
    reference's per-level write2 loop + writeVertToHoriz,
    eul/Euler_2.cpp:1504-1534).  Consumed by scr/plot_cross_section.py and
    scr/plot_latlon.py."""
    _ensure(outdir)
    lonlat = np.asarray(ops.lonlat)
    zmid = 0.5 * np.asarray(vo.levs[:-1] + vo.levs[1:])
    out = dict(lon=lonlat[..., 0], lat=lonlat[..., 1], zmid=zmid,
               levs=np.asarray(vo.levs))
    for name, (kind, coef) in fields.items():
        if kind == "layer":
            out[name] = np.asarray(vo.phys_layer(coef))
        elif kind == "interface":
            out[name] = np.asarray(vo.phys_int(coef))
        elif kind == "u1":
            import jax
            # flux-form layer 1-forms: physical wind = interp/thick
            up = np.asarray(jax.vmap(ops.interp1_phys)(coef)) \
                / np.asarray(vo.thickq)[..., None]
            out[name + "_x"] = up[..., 0]
            out[name + "_y"] = up[..., 1]
        else:
            raise ValueError(kind)
    np.savez_compressed(os.path.join(outdir, f"layers_{step:04d}.npz"), **out)


def append_conservation(path, time_s, drifts: dict, header=None):
    """Append one line of conservation drifts (time in days first,
    src/SWEqn_Picard.cpp:1348-1354)."""
    _ensure(os.path.dirname(path) or ".")
    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new and header:
            f.write("# " + "\t".join(["time_days"] + list(header)) + "\n")
        cols = [time_s / 86400.0] + [float(drifts[k]) for k in (header or drifts)]
        f.write("\t".join(f"{c:.16e}" for c in cols) + "\n")


def save_checkpoint(path, step, **fields):
    """State dump for restart (the analogue of the .vec dumps).

    Atomic (tmp + os.replace): production drivers checkpoint after every
    sub-chunk on a crash-prone tunneled TPU, and a checkpoint truncated by a
    mid-write crash would wedge the resume loop.  Uncompressed: zlib on the
    ~50 MB f32 state costs seconds per save on a 1-core host."""
    _ensure(os.path.dirname(path) or ".")
    tmp = path + ".tmp.npz"
    # format marker: horizontal-velocity coefficients are FLUX-FORM
    # (iu = thick * u_phys); pre-marker checkpoints are point-value and
    # upgraded on load by migrate_velx_flux
    np.savez(tmp, __step=step, __vel_form="flux",
             **{k: np.asarray(v) for k, v in fields.items()})
    os.replace(tmp, path)


def load_checkpoint(path):
    data = np.load(path)
    step = int(data["__step"])
    # "__"-prefixed keys are format markers (strings/meta), not device arrays
    fields = {k: (np.asarray(data[k]) if k.startswith("__")
                  else jnp.asarray(data[k]))
              for k in data.files if k != "__step"}
    return step, fields


def migrate_velx_flux(fields, vo, keys=("velx", "velx_prev")):
    """Upgrade a pre-flux-form 3D checkpoint: point-value horizontal-velocity
    coefficients -> flux form (iu_new = thick_k * iu_old, exact for
    horizontally-uniform levels -- asserted).  No-op on checkpoints carrying
    the __vel_form='flux' marker."""
    if "__vel_form" in fields and str(fields["__vel_form"]) == "flux":
        return fields
    tq = np.asarray(vo.thickq)
    if not np.allclose(tq, tq[:, :1, :1], rtol=1e-10):
        raise ValueError("cannot migrate a point-value checkpoint on "
                         "terrain-following (horizontally-varying) levels")
    scale = tq.mean(axis=(1, 2))[:, None]
    for k in keys:
        if k in fields:
            fields[k] = fields[k] * jnp.asarray(scale, fields[k].dtype)
    return fields
