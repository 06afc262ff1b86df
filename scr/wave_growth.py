#!/usr/bin/env python
"""Baroclinic wave-growth series from committed UMJS14 dumps.

Extracts the two standard growth metrics of the UMJS14 baroclinic-wave test
(Ullrich et al. QJRMS 2014, Fig. 8) from each `layers_NNNN.npz` dump written
by demo/run_umjs14.py:

  * NH minimum surface pressure (hPa), p = P0 (exner_0 / cp)^(cp/Rd)
  * max |v| (meridional wind) in the NH storm track at the level nearest 1 km

Writes `wave_growth.dat` (day, pmin_hPa, vmax_ms) next to the dumps and a
two-panel figure `wave_growth.png`.  Host-side only (numpy/matplotlib); the
dumps store physical quadrature-point values (utils/io.write_layers).

Usage: python scr/wave_growth.py demo/umjs14 [--dump-hours 12]
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mimsem_tpu.models.vertical import RD, CP, P0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--dump-hours", type=float, default=12.0)
    args = ap.parse_args()

    rows = []
    for f in sorted(glob.glob(os.path.join(args.outdir, "layers_*.npz"))):
        d = np.load(f)
        step = int(os.path.basename(f)[7:11])
        day = step * args.dump_hours / 24.0
        lat = np.degrees(d["lat"])
        nh = (lat > 20.0) & (lat < 80.0)
        p = P0 * (d["exner"][0] / CP) ** (CP / RD) / 100.0
        pmin = float(np.min(np.where(nh, p, 1e9)))
        zmid = d["zmid"].mean(axis=(1, 2)) if d["zmid"].ndim == 3 \
            else d["zmid"]
        l1 = int(np.argmin(np.abs(zmid - 1000.0)))
        vmax = float(np.max(np.where(nh, np.abs(d["u_y"][l1]), 0.0)))
        rows.append((day, pmin, vmax))
        print(f"day {day:5.1f}  pmin {pmin:9.3f} hPa  vmax {vmax:7.3f} m/s")

    rows = np.asarray(rows)
    np.savetxt(os.path.join(args.outdir, "wave_growth.dat"), rows,
               header="day  NH_min_ps_hPa  NH_vmax_1km_ms")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, (a1, a2) = plt.subplots(2, 1, figsize=(7, 7), sharex=True)
    a1.plot(rows[:, 0], rows[:, 1], "o-")
    a1.set_ylabel("NH min surface pressure [hPa]")
    a1.grid(alpha=0.3)
    a2.semilogy(rows[:, 0], rows[:, 2], "o-")
    a2.set_ylabel("NH max |v| at ~1 km [m/s]")
    a2.set_xlabel("day")
    a2.grid(alpha=0.3, which="both")
    fig.suptitle("UMJS14 baroclinic wave growth (cf. Ullrich et al. 2014 "
                 "Fig. 8)")
    fig.tight_layout()
    out = os.path.join(args.outdir, "wave_growth.png")
    fig.savefig(out, dpi=110)
    print("wrote", out)


if __name__ == "__main__":
    main()
