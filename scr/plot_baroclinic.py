#!/usr/bin/env python
"""Baroclinic-wave gallery figure from a UMJS14 layers dump.

The reference's flagship gallery image (README.md picture links) shows the
wave breaking at days 8-10: lower-level relative vorticity + potential
temperature.  This script reads a layers_*.npz (physical values at
quadrature points, utils/io.write_layers) and renders

  * theta at a chosen level (default level 1, ~1 km) on a lat-lon map,
  * relative vorticity zeta = (dv/dlon - d(u cos(lat))/dlat) / (R cos(lat))
    computed spectrally-free by finite differences on the resampled regular
    lat-lon grid of the dumped physical winds (u_x/u_y),

over the northern mid-latitude band where the instability grows
(eul/UMJS14.cpp perturbation at lon=pi/9, lat=2pi/9).

Usage: python scr/plot_baroclinic.py demo/umjs14/layers_0008.npz [--level 1]
"""
import argparse
import os

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from scipy.interpolate import griddata

RAD = 6371220.0


def regrid(lon, lat, vals, nlon=720, nlat=361):
    lon = np.mod(lon.ravel(), 2 * np.pi)
    lat = lat.ravel()
    vals = vals.ravel()
    pad_lo = lon < 0.5
    pad_hi = lon > 2 * np.pi - 0.5
    lon_p = np.concatenate([lon, lon[pad_lo] + 2 * np.pi, lon[pad_hi] - 2 * np.pi])
    lat_p = np.concatenate([lat, lat[pad_lo], lat[pad_hi]])
    val_p = np.concatenate([vals, vals[pad_lo], vals[pad_hi]])
    gl = np.linspace(0, 2 * np.pi, nlon)
    gp = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    GL, GP = np.meshgrid(gl, gp)
    out = griddata((lon_p, lat_p), val_p, (GL, GP), method="linear")
    nn = griddata((lon_p, lat_p), val_p, (GL, GP), method="nearest")
    out[np.isnan(out)] = nn[np.isnan(out)]
    return gl, gp, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dump-hours", type=float, default=24.0,
                    help="hours of simulated time per dump index "
                         "(filename index * dump_hours / 24 = day label)")
    args = ap.parse_args()
    d = np.load(args.path)
    k = args.level
    lon, lat = d["lon"], d["lat"]
    idx = int(os.path.basename(args.path).split("_")[1].split(".")[0])
    day = idx * args.dump_hours / 24.0

    gl, gp, TH = regrid(lon, lat, d["theta"][k])
    _, _, U = regrid(lon, lat, d["u_x"][k])
    _, _, V = regrid(lon, lat, d["u_y"][k])
    dlon = gl[1] - gl[0]
    dlat = gp[1] - gp[0]
    cphi = np.cos(gp)[:, None]
    cphi = np.where(np.abs(cphi) < 1e-3, np.nan, cphi)
    dv_dlon = np.gradient(V, dlon, axis=1)
    ducos_dlat = np.gradient(U * np.cos(gp)[:, None], dlat, axis=0)
    zeta = (dv_dlon - ducos_dlat) / (RAD * cphi)

    band = (gp > np.deg2rad(10)) & (gp < np.deg2rad(80))
    fig, axs = plt.subplots(2, 1, figsize=(13, 7), constrained_layout=True)
    zm = np.nanmax(np.abs(zeta[band]))
    im0 = axs[0].pcolormesh(np.rad2deg(gl), np.rad2deg(gp[band]),
                            zeta[band], cmap="RdBu_r",
                            vmin=-zm, vmax=zm, shading="auto")
    axs[0].set_title(f"relative vorticity, level {k} (day {day:g})")
    fig.colorbar(im0, ax=axs[0], label="1/s")
    im1 = axs[1].pcolormesh(np.rad2deg(gl), np.rad2deg(gp[band]),
                            TH[band], cmap="turbo", shading="auto")
    axs[1].set_title(f"potential temperature, level {k}")
    fig.colorbar(im1, ax=axs[1], label="K")
    for ax in axs:
        ax.set_xlabel("lon [deg]")
        ax.set_ylabel("lat [deg]")
    out = args.out or args.path.replace(
        ".npz", f"_baroclinic_l{k}.png").replace("layers_", "wave_")
    fig.savefig(out, dpi=130)
    print(out)


if __name__ == "__main__":
    main()
