#!/usr/bin/env python
"""Mountain-wave cross-section + vertical-wavelength measurement.

The terrain-capability validation figure (VERDICT r3 task 4): contour w on
the y = 0.5 LX vertical plane through the hill from a layers dump of
demo/run_mountain_wave.py, and measure the vertical wavelength of the
stationary wave train above the hill against linear theory,
lambda_z = 2 pi U0 / N (~6.28 km for U0=10, N=1e-2; Smith 1980).  The
hydrostatic regime signature asserted visually: phase lines tilt UPSTREAM
with height.

lambda_z is measured from the zero crossings of w(z) averaged over the
columns within one half-width of the hill crest.

Usage: python scr/plot_mountain_wave.py demo/mountain_wave/layers_0006.npz
"""
import argparse
import os
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from scipy.interpolate import griddata

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mimsem_tpu.testcases import mountain_wave as mw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--band", type=float, default=6.0e3,
                    help="half-width of the y band selected for the slice")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    d = np.load(args.path)
    x, y = d["lon"], d["lat"]                # box dumps store x/y here
    w = d["w"]                               # (nk-1, nel, nq) interfaces
    zmid = d["zmid"]
    levs = d["levs"]                         # (nk+1, nel, nq) terrain-following
    nki = w.shape[0]
    zint = levs[1:-1]                        # interior interface heights

    sel = np.abs(y - 0.5 * mw.LX) < args.band
    pts_x, pts_z, pts_v = [], [], []
    for k in range(nki):
        pts_x.append(x[sel])
        pts_z.append(zint[k][sel])
        pts_v.append(w[k][sel])
    px = np.concatenate(pts_x)
    pz = np.concatenate(pts_z)
    pv = np.concatenate(pts_v)

    xi = np.linspace(0.0, mw.LX, 241)
    zi = np.linspace(0.0, mw.ZTOP, 211)
    vi = griddata((px, pz), pv, (xi[None, :], zi[:, None]), method="linear")

    # --- lambda_z from zero crossings over the hill crest -----------------
    crest = np.abs(xi - 0.4 * mw.LX) < 0.5 * mw.A_HILL
    prof = np.nanmean(vi[:, crest], axis=1)
    good = np.isfinite(prof) & (zi < mw.ZTOP - 4.5e3)   # exclude the sponge
    zg, pg = zi[good], prof[good]
    sign = np.sign(pg)
    zc = zg[:-1][np.diff(sign) != 0]
    lam_meas = 2.0 * np.median(np.diff(zc)) if len(zc) >= 3 else float("nan")
    lam_theory = 2.0 * np.pi * mw.U0 / np.sqrt(mw.NSQ)

    fig, axs = plt.subplots(1, 2, figsize=(11, 4.2),
                            gridspec_kw=dict(width_ratios=[3, 1]))
    lim = np.nanmax(np.abs(vi))
    cs = axs[0].contourf(xi / 1e3, zi / 1e3, vi, levels=21, cmap="RdBu_r",
                         vmin=-lim, vmax=lim)
    fig.colorbar(cs, ax=axs[0], label="w (m/s)")
    hx = np.linspace(0, mw.LX, 600)
    axs[0].fill_between(hx / 1e3, 0,
                        np.asarray(mw.topog(hx, 0.5 * mw.LX * np.ones_like(hx)))
                        / 1e3, color="k")
    axs[0].axhline((mw.ZTOP - 4.0e3) / 1e3, color="gray", ls=":",
                   label="sponge base")
    axs[0].set_xlabel("x (km)")
    axs[0].set_ylabel("z (km)")
    axs[0].set_title(f"w, y-midplane  (N A/U0 = "
                     f"{np.sqrt(mw.NSQ) * mw.A_HILL / mw.U0:.0f})")
    axs[1].plot(pg, zg / 1e3)
    axs[1].axvline(0, color="k", lw=0.5)
    for z0 in zc:
        axs[1].axhline(z0 / 1e3, color="gray", lw=0.4)
    axs[1].set_xlabel("w over crest (m/s)")
    axs[1].set_title(f"$\\lambda_z$ = {lam_meas/1e3:.2f} km\n"
                     f"(theory $2\\pi U_0/N$ = {lam_theory/1e3:.2f} km)")
    out = args.out or os.path.join(os.path.dirname(args.path),
                                   "mountain_wave_w.png")
    fig.savefig(out, dpi=140, bbox_inches="tight")
    # machine-readable companion for tests/test_run_oracles.py
    np.savez_compressed(out.replace(".png", ".npz"),
                        lam_meas=lam_meas, lam_theory=lam_theory,
                        z=zg, w_crest=pg, x=xi, zi=zi, w=vi)
    print(f"wrote {out}")
    print(f"lambda_z measured {lam_meas/1e3:.3f} km, "
          f"theory {lam_theory/1e3:.3f} km, "
          f"ratio {lam_meas/lam_theory:.3f}")


if __name__ == "__main__":
    main()
