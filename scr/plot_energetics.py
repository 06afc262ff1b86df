#!/usr/bin/env python
"""Energy budget plots from energetics.dat (the 12-column Euler log).

Port of the reference's scr/PlotEnergetics.py (:10-75) to the runner's
format: header line + [time_days, keh, kev, pe, ie, k2p, p2k, k2i, i2k,
k2i_z, i2k_z, mass, entr].  Produces the total-drift, partition-difference
and exchange-power figures.

Column deviation vs the reference: our k2i sums ALL THREE horizontal EC
pressure-splitting term powers so dIE = dt*(k2i + k2i_z) closes in f64; the
reference's k2i column (eul/HorizSolve.cpp:704-708) logs only the
E12 M2h(Pi) theta piece and is several orders smaller.  See
Euler3D.energetics_ec (mimsem_tpu/models/euler3d.py) for the
reference-comparable single term.

Usage: python scr/plot_energetics.py output/energetics.dat
"""
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

COLS = ["keh", "kev", "pe", "ie", "k2p", "p2k", "k2i", "i2k",
        "k2i_z", "i2k_z", "mass", "entr"]


def main(path, prefix=None):
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None, :]
    t = data[:, 0]
    c = {n: data[:, 1 + i] for i, n in enumerate(COLS) if 1 + i < data.shape[1]}
    prefix = prefix or path.rsplit(".", 1)[0]

    etot = c["keh"] + c["kev"] + c["pe"] + c["ie"]
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(t, (etot - etot[0]) / etot[0])
    ax.set_xlabel("time (days)"); ax.set_ylabel("(E - E0)/E0")
    ax.set_title("total energy drift")
    ax.grid(alpha=0.3)
    fig.savefig(prefix + "_total.png", dpi=120, bbox_inches="tight")

    fig, ax = plt.subplots(figsize=(8, 5))
    for name, lbl in (("keh", "K (horiz.)"), ("kev", "K (vert.)"),
                      ("pe", "P"), ("ie", "I")):
        ax.plot(t, c[name] - c[name][0], label=lbl)
    ax.plot(t, etot - etot[0], "k--", label="Total")
    ax.legend(loc="best"); ax.grid(alpha=0.3)
    ax.set_xlabel("time (days)"); ax.set_ylabel("E - E(t=0)")
    fig.savefig(prefix + "_partition.png", dpi=120, bbox_inches="tight")

    if "k2p" in c:
        fig, ax = plt.subplots(figsize=(8, 5))
        for name, lbl in (("k2p", "K to P"), ("p2k", "P to K"),
                          ("k2i", "K to I (horiz)"), ("k2i_z", "K to I (vert)")):
            if name in c:
                ax.plot(t, c[name], label=lbl)
        ax.legend(loc="best"); ax.grid(alpha=0.3)
        ax.set_xlabel("time (days)")
        ax.set_ylabel(r"power ($kg\,m^2 s^{-3}$)")
        fig.savefig(prefix + "_exchanges.png", dpi=120, bbox_inches="tight")

    print(prefix + "_{total,partition,exchanges}.png")


if __name__ == "__main__":
    main(*sys.argv[1:])
