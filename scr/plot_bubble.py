#!/usr/bin/env python
"""Theta' rise plot for the box warm-bubble run (box/Bubble.cpp config).

Reads demo/bubble/series.dat (t, theta'_max, z_centroid, |w|_max, mass
drift) and plots the bubble ascent -- the centroid height and max
perturbation vs time -- the reference-scale driver diagnostic asked for in
VERDICT r3 (task 6).

Usage: python scr/plot_bubble.py demo/bubble [--out f.png]
"""
import argparse
import os

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="demo/bubble")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    s = np.loadtxt(os.path.join(args.outdir, "series.dat"))
    if s.ndim == 1:
        s = s[None, :]
    t, thmax, zc, wmax = s[:, 0], s[:, 1], s[:, 2], s[:, 3]

    fig, ax = plt.subplots(figsize=(6.4, 4))
    ax.plot(t, zc, "o-", color="tab:blue", label="$\\theta'$ centroid height")
    ax.set_xlabel("t (s)")
    ax.set_ylabel("z (m)", color="tab:blue")
    ax2 = ax.twinx()
    ax2.plot(t, thmax, "s--", color="tab:red", label="max $\\theta'$")
    ax2.set_ylabel("max $\\theta'$ (K)", color="tab:red")
    ax.set_title("warm bubble ascent (box, NK=%d levels)" %
                 (len(np.load(os.path.join(args.outdir, "layers_0001.npz"))
                      ["zmid"]) if os.path.exists(
                      os.path.join(args.outdir, "layers_0001.npz")) else 0))
    fig.legend(loc="upper left", bbox_to_anchor=(0.12, 0.88))
    out = args.out or os.path.join(args.outdir, "bubble_rise.png")
    fig.savefig(out, dpi=140, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
