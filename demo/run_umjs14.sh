#!/bin/sh
# Supervised 12-day UMJS14 production run: relaunch-and-resume on the
# tunneled TPU's intermittent UNAVAILABLE device errors.  The python driver
# checkpoints the full extended EC state at every dump (resume is bit-exact,
# tests/test_restart_convergence.py), so a crash costs at most one dump
# interval of recompute plus a rebuild.
#
# Usage: sh demo/run_umjs14.sh [outdir] [ne] [nk] [days] [dt] [dump_hours]
cd "$(dirname "$0")/.." || exit 1
out="${1:-demo/umjs14}"
tries=0
while [ "$tries" -lt 24 ]; do
    python demo/run_umjs14.py "$out" "${2:-12}" "${3:-30}" "${4:-12}" \
        "${5:-75}" "${6:-24}" && exit 0
    rc=$?
    if [ "$rc" -eq 42 ]; then
        echo "== NaN abort (deterministic blowup): not retrying" >&2
        exit 42
    fi
    tries=$((tries + 1))
    echo "== driver exited nonzero (attempt $tries); resuming from" \
         "$out/checkpoint.npz in 30 s" >&2
    sleep 30
done
echo "== giving up after $tries attempts" >&2
exit 1
