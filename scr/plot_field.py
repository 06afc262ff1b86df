#!/usr/bin/env python
"""Plot a dumped field (.npz) on the sphere: lon/lat scatter-contour.

Replacement for the reference's scr/WriteImage*.py (Delaunay triangulation of
the .dat dumps).  Usage: python scr/plot_field.py output/pressure_0001.npz
"""
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.tri as mtri


def main(path, out=None):
    d = np.load(path)
    lon, lat, vals = (d[k].ravel() for k in ("lon", "lat", "vals"))
    tri = mtri.Triangulation(lon, lat)
    # drop triangles crossing the dateline
    lon_t = lon[tri.triangles]
    mask = (lon_t.max(axis=1) - lon_t.min(axis=1)) > np.pi
    tri.set_mask(mask)
    fig, ax = plt.subplots(figsize=(10, 5))
    tc = ax.tricontourf(tri, vals, levels=41, cmap="RdYlBu_r")
    fig.colorbar(tc, ax=ax)
    ax.set_xlabel("lon")
    ax.set_ylabel("lat")
    ax.set_title(path)
    out = out or path.replace(".npz", ".png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main(*sys.argv[1:])
