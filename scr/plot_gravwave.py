#!/usr/bin/env python
"""Equatorial theta-perturbation cross-section for the DCMIP31 gravity wave.

The standard figure for the testcase (cf. the reference's gravity-wave
output plotted with scr/PlotCrossSection*.py): theta' = theta - theta_bar
along the equator at the final time, where theta_bar is the ANALYTIC
N^2-stratified background (mimsem_tpu/testcases/gravwave.py theta_back,
eul/GravWave.cpp:60-75) -- the propagating wave trains are O(0.1 K) on a
300-1000 K background, so subtracting the projected initial state instead
would bury them in projection error.

Usage: python scr/plot_gravwave.py demo/gravwave/layers_0004.npz [--out f.png]
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
from mimsem_tpu.testcases import gravwave as gw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--band", type=float, default=0.12)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    d = np.load(args.path)
    lon, lat = d["lon"], d["lat"]            # (nel, nq)
    theta = d["theta"]                       # (nk, nel, nq)
    zmid = d["zmid"]                         # (nk, nel, nq)
    nk = theta.shape[0]

    sel = np.abs(lat) < args.band
    pts_lon, pts_z, pts_v = [], [], []
    import jax.numpy as jnp
    for k in range(nk):
        thb = np.asarray(gw.theta_back(jnp.asarray(lat[sel]),
                                       jnp.asarray(zmid[k][sel])))
        pts_lon.append(lon[sel])
        pts_z.append(zmid[k][sel])
        pts_v.append(theta[k][sel] - thb)
    x = np.concatenate(pts_lon)
    z = np.concatenate(pts_z)
    v = np.concatenate(pts_v)

    xi = np.linspace(-np.pi, np.pi, 361)
    zi = np.linspace(z.min(), z.max(), 101)
    vi = griddata((x, z), v, (xi[None, :], zi[:, None]), method="linear")

    fig, ax = plt.subplots(figsize=(9, 3.2))
    lim = np.nanmax(np.abs(vi))
    cs = ax.contourf(np.degrees(xi), zi / 1000.0, vi, levels=21,
                     cmap="RdBu_r", vmin=-lim, vmax=lim)
    fig.colorbar(cs, ax=ax, label=r"$\theta'$ (K)")
    ax.set_xlabel("longitude (deg)")
    ax.set_ylabel("z (km)")
    ax.set_title(os.path.basename(args.path)
                 + rf"  equatorial $\theta'$, max {lim:.3f} K")
    out = args.out or os.path.join(os.path.dirname(args.path),
                                   "theta_prime_xsec.png")
    fig.savefig(out, dpi=140, bbox_inches="tight")
    # machine-readable companion (pattern: scr/plot_zonal_mean.py) so
    # tests/test_run_oracles.py can pin the split-wave-train structure
    np.savez_compressed(out.replace(".png", ".npz"),
                        lon=xi, z=zi, theta_prime=vi)
    print(f"wrote {out}  (max |theta'| = {lim:.4f} K)")


if __name__ == "__main__":
    main()
