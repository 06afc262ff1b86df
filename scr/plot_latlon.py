#!/usr/bin/env python
"""Lat-lon interpolated image + north-hemisphere polar view of a dumped field.

Replacement for the reference's scr/WriteImages.py / WriteImage_NorthHemi.py
(:12-50): instead of Delaunay-triangulating raw .dat dumps against an offline
mesh file, reads the self-describing .npz dumps (lon/lat + values) and
resamples onto a regular lat-lon grid.

Usage:
  python scr/plot_latlon.py output/vorticity_0020.npz            # global
  python scr/plot_latlon.py output/vorticity_0020.npz --north    # polar view
  python scr/plot_latlon.py output/layers_0003.npz --field theta --level 12
"""
import argparse

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from scipy.interpolate import griddata


def latlon_grid(lon, lat, vals, nlon=360, nlat=181):
    """Nearest+linear resampling onto a regular grid, periodic in lon."""
    lon = np.mod(lon.ravel(), 2 * np.pi)
    lat = lat.ravel()
    vals = vals.ravel()
    # pad the dateline so linear interpolation wraps
    pad = lon < 0.5
    pad2 = lon > 2 * np.pi - 0.5
    lon_p = np.concatenate([lon, lon[pad] + 2 * np.pi, lon[pad2] - 2 * np.pi])
    lat_p = np.concatenate([lat, lat[pad], lat[pad2]])
    val_p = np.concatenate([vals, vals[pad], vals[pad2]])
    gl = np.linspace(0, 2 * np.pi, nlon)
    gp = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    GL, GP = np.meshgrid(gl, gp)
    Z = griddata((lon_p, lat_p), val_p, (GL, GP), method="linear")
    hole = np.isnan(Z)
    if hole.any():
        Z[hole] = griddata((lon_p, lat_p), val_p, (GL[hole], GP[hole]),
                           method="nearest")
    return GL, GP, Z


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--field", default="vals",
                    help="array name inside the npz (layers dumps: theta/rho/...)")
    ap.add_argument("--level", type=int, default=None,
                    help="vertical level index for 3D layers dumps")
    ap.add_argument("--north", action="store_true",
                    help="north-hemisphere polar projection (WriteImage_NorthHemi)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    d = np.load(args.path)
    vals = d[args.field]
    if args.level is not None:
        vals = vals[args.level]
    GL, GP, Z = latlon_grid(d["lon"], d["lat"], vals)

    fig = plt.figure(figsize=(10, 5))
    if args.north:
        ax = fig.add_subplot(111, projection="polar")
        nh = GP >= 0
        r = (np.pi / 2 - GP)[nh].reshape(-1, GL.shape[1])
        th = GL[nh].reshape(r.shape)
        tc = ax.contourf(th, r, Z[nh].reshape(r.shape), levels=100,
                         cmap="RdYlBu_r")
        ax.set_xticks([]); ax.set_yticks([])
    else:
        ax = fig.add_subplot(111)
        tc = ax.contourf(np.degrees(GL), np.degrees(GP), Z, levels=100,
                         cmap="RdYlBu_r")
        ax.set_xlabel("lon (deg)"); ax.set_ylabel("lat (deg)")
    fig.colorbar(tc, ax=ax)
    ax.set_title(f"{args.path}:{args.field}"
                 + (f" lev {args.level}" if args.level is not None else ""))
    out = args.out or args.path.replace(".npz", f"_{args.field}_ll.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
