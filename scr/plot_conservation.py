#!/usr/bin/env python
"""Plot conservation / energetics time series.

Replacement for scr/PlotEnergetics.py: reads the tab-separated
conservation.dat / energetics.dat appended by the runners and plots each drift
column vs time (days).  Usage: python scr/plot_conservation.py output/conservation.dat
"""
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main(path, out=None):
    with open(path) as f:
        first = f.readline()
    names = first.lstrip("# ").split() if first.startswith("#") else None
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None, :]
    t = data[:, 0]
    fig, ax = plt.subplots(figsize=(8, 5))
    for j in range(1, data.shape[1]):
        label = names[j] if names and j < len(names) else f"col{j}"
        ax.plot(t, data[:, j], label=label)
    ax.set_xlabel("time (days)")
    ax.set_ylabel("relative drift")
    ax.legend()
    ax.grid(alpha=0.3)
    out = out or path.rsplit(".", 1)[0] + ".png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main(*sys.argv[1:])
