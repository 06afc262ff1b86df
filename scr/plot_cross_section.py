#!/usr/bin/env python
"""Vertical cross-section of a 3D layers dump.

Replacement for the reference's scr/PlotCrossSectionBox.py (:1-90): reads a
layers_*.npz written by the Euler runners (physical values at quadrature
points per level + z coordinates) and contours a field on a (distance, z)
slice along a line of constant latitude (sphere) or constant y (box).

Usage:
  python scr/plot_cross_section.py output/layers_0003.npz --field theta
  python scr/plot_cross_section.py output/layers_0003.npz --field w --lat 0.0
"""
import argparse

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from scipy.interpolate import griddata


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--field", default="theta")
    ap.add_argument("--lat", type=float, default=0.0,
                    help="latitude (radians) of the slice; box dumps use y")
    ap.add_argument("--band", type=float, default=0.05,
                    help="half-width of the point band selected for the slice")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    d = np.load(args.path)
    lon = d["lon"].ravel()
    lat = d["lat"].ravel()
    vals = d[args.field]                     # (nlev, nel, nq)
    nlev = vals.shape[0]
    zmid = d["zmid"]                         # (nk, nel, nq)
    levs = d["levs"]                         # (nk+1, nel, nq)
    if nlev == zmid.shape[0]:
        z = zmid.reshape(nlev, -1)           # layer field
    else:                                    # interior-interface field (nk-1)
        z = levs[1:-1].reshape(nlev, -1)

    # --band is in the dump's y units (radians on the sphere, metres in the
    # box); if the default band catches too few points, widen it adaptively
    # to the coordinate scale so box dumps work out of the box
    band = args.band
    sel = np.abs(lat - args.lat) < band
    if sel.sum() < 4:
        band = 0.05 * (lat.max() - lat.min() + 1e-30)
        sel = np.abs(lat - args.lat) < band
    if sel.sum() < 4:
        lat0 = np.median(lat)
        sel = np.abs(lat - lat0) < band
        print(f"no points near lat={args.lat}; slicing at lat={lat0:.3g}")
    if sel.sum() < 4:
        raise SystemExit(f"only {sel.sum()} points within band of lat={args.lat}")
    x = lon[sel]
    pts_x = np.tile(x, nlev)
    pts_z = z[:, sel].ravel()
    pts_v = vals.reshape(nlev, -1)[:, sel].ravel()

    gx = np.linspace(x.min(), x.max(), 256)
    gz = np.linspace(pts_z.min(), pts_z.max(), 128)
    GX, GZ = np.meshgrid(gx, gz)
    Z = griddata((pts_x, pts_z), pts_v, (GX, GZ), method="linear")
    hole = np.isnan(Z)
    if hole.any():
        Z[hole] = griddata((pts_x, pts_z), pts_v, (GX[hole], GZ[hole]),
                           method="nearest")

    fig, ax = plt.subplots(figsize=(10, 4))
    tc = ax.contourf(GX, GZ, Z, levels=61, cmap="RdYlBu_r")
    fig.colorbar(tc, ax=ax)
    ax.set_xlabel("lon (rad)" if x.max() - x.min() < 7.0 else "x (m)")
    ax.set_ylabel("z (m)")
    ax.set_title(f"{args.field} at lat={args.lat:+.2f}")
    out = args.out or args.path.replace(".npz", f"_{args.field}_xsec.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
