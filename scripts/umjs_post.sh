#!/bin/sh
# Post-process the completed 12-day UMJS14 run into the gallery artifacts
# (VERDICT r2 item 1): baroclinic wave-breaking maps at days 6/8/10/12,
# the 12-column energetics series, and a mid-latitude theta cross section.
# Dump cadence is 12 h (dump NNNN = day NNNN/2).  CPU-only (matplotlib).
#
# Usage: sh scripts/umjs_post.sh [outdir]
cd "$(dirname "$0")/.." || exit 1
out="${1:-demo/umjs14}"
for d in 12 16 20 24; do
    [ -f "$out/layers_$(printf %04d $d).npz" ] && \
        python scr/plot_baroclinic.py "$out/layers_$(printf %04d $d).npz" \
            --level 1 --dump-hours 12
done
python scr/plot_energetics.py "$out/energetics.dat"
last=$(ls "$out"/layers_*.npz | tail -1)
python scr/plot_cross_section.py "$last" --field theta --lat 0.87 \
    --out "$out/theta_xsec_day12.png"
ls -la "$out"/*.png
