#!/usr/bin/env python
"""Zonal-mean climatology from a series of 3D layers dumps.

The Held-Suarez diagnostic (the reference's published result for
eul/HeldSuarez.cpp): time + zonal mean of the zonal wind contoured on
(latitude, height), showing the two midlatitude westerly jets.  Any layer
field works (--field theta gives the thermal structure).

Averages all dumps in [--d0, --d1] (inclusive); each quadrature point is
binned by latitude (the cubed-sphere points are not on latitude lines, so
binning IS the zonal mean).

Usage:
  python scr/plot_zonal_mean.py demo/held_suarez --d0 10 --d1 30
  python scr/plot_zonal_mean.py demo/held_suarez --field theta
"""
import argparse
import glob
import os

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--field", default="u_x")
    ap.add_argument("--d0", type=int, default=0, help="first dump index")
    ap.add_argument("--d1", type=int, default=10**9, help="last dump index")
    ap.add_argument("--nbins", type=int, default=48)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    paths = sorted(glob.glob(os.path.join(args.outdir, "layers_*.npz")))
    paths = [p for p in paths
             if args.d0 <= int(p.rsplit("_", 1)[1][:-4]) <= args.d1]
    if not paths:
        raise SystemExit(f"no dumps in [{args.d0}, {args.d1}] in {args.outdir}")

    acc = cnt = None
    for p in paths:
        d = np.load(p)
        lat = d["lat"].ravel()
        vals = d[args.field]                      # (nlev, nel, nq)
        nlev = vals.shape[0]
        v = vals.reshape(nlev, -1)
        zmid = d["zmid"] if nlev == d["zmid"].shape[0] else d["levs"][1:-1]
        z = zmid.reshape(nlev, -1)
        edges = np.linspace(-np.pi / 2, np.pi / 2, args.nbins + 1)
        ib = np.clip(np.digitize(lat, edges) - 1, 0, args.nbins - 1)
        if acc is None:
            acc = np.zeros((nlev, args.nbins))
            zac = np.zeros((nlev, args.nbins))
            cnt = np.zeros((nlev, args.nbins))
        for k in range(nlev):
            acc[k] += np.bincount(ib, weights=v[k], minlength=args.nbins)
            zac[k] += np.bincount(ib, weights=z[k], minlength=args.nbins)
            cnt[k] += np.bincount(ib, minlength=args.nbins)

    mean = acc / np.maximum(cnt, 1)
    zkm = (zac / np.maximum(cnt, 1)) / 1000.0
    latc = np.degrees(0.5 * (edges[:-1] + edges[1:]))
    L = np.broadcast_to(latc, mean.shape)

    fig, ax = plt.subplots(figsize=(7.2, 4.2))
    signed = mean.min() < -0.05 * abs(mean).max()
    if signed:
        # diverging: two hues + neutral midpoint, symmetric about 0
        m = abs(mean).max()
        cf = ax.contourf(L, zkm, mean, levels=np.linspace(-m, m, 21),
                         cmap="RdBu_r")
    else:
        cf = ax.contourf(L, zkm, mean, levels=20, cmap="viridis")
    cs = ax.contour(L, zkm, mean, levels=cf.levels[::2], colors="k",
                    linewidths=0.4, alpha=0.5)
    ax.clabel(cs, fontsize=6, fmt="%.0f")
    fig.colorbar(cf, ax=ax, label=args.field)
    ax.set_xlabel("latitude (deg)")
    ax.set_ylabel("z (km)")
    d0 = int(paths[0].rsplit("_", 1)[1][:-4])
    d1 = int(paths[-1].rsplit("_", 1)[1][:-4])
    ax.set_title(f"zonal-mean {args.field}, dumps {d0}-{d1} "
                 f"({len(paths)} samples)", fontsize=10)
    ax.spines[["top", "right"]].set_visible(False)
    out = args.out or os.path.join(args.outdir,
                                   f"zonal_mean_{args.field}.png")
    fig.savefig(out, dpi=150, bbox_inches="tight")
    # machine-readable companion so oracle tests can pin the climatology
    # (e.g. the Held-Suarez westerly jets) without re-binning dumps
    np.savez(out.rsplit(".", 1)[0] + ".npz", mean=mean, lat_deg=latc,
             z_km=zkm, dumps=np.asarray([d0, d1, len(paths)]))
    print(out)


if __name__ == "__main__":
    main()
