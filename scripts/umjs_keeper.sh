#!/bin/sh
# Outer keeper for the 12-day UMJS14 production run on the crash-prone
# tunneled TPU.  Layering (innermost first):
#   run_umjs14.py   checkpoints after every synced sub-chunk (monotonic
#                   progress) and self-tunes the dispatch length
#   run_umjs14.sh   supervisor: relaunch-and-resume, <=24 tries
#   umjs_watchdog.sh kills a HUNG driver (stale log) by pid, never pattern
#   this script     waits out any pre-existing driver (arg 1), then keeps
#                   relaunching the supervised run until the checkpoint
#                   reaches the full step count or a NaN abort (exit 42)
#
# Usage: sh scripts/umjs_keeper.sh [existing_driver_pid]
cd "$(dirname "$0")/.." || exit 1
cur="$1"
total=13824
log=/tmp/q_umjs14.log
ck=demo/umjs14/checkpoint.npz

# phase 1: hang-guard a driver we did not launch (pid only)
if [ -n "$cur" ]; then
    while kill -0 "$cur" 2>/dev/null; do
        sleep 60
        now=$(date +%s)
        mt=$(stat -c %Y "$log" 2>/dev/null || echo "$now")
        if [ $((now - mt)) -gt 900 ]; then
            echo "== $(date +%H:%M:%S) keeper: driver $cur stale; killing"
            kill "$cur" 2>/dev/null; sleep 10; kill -9 "$cur" 2>/dev/null
        fi
    done
fi

# phase 2: relaunch until done
while :; do
    step=$(python -c "import numpy as np; \
print(int(np.load('$ck')['__step']))" 2>/dev/null || echo 0)
    if [ "$step" -ge "$total" ] || [ -f demo/umjs14/summary.txt ]; then
        echo "== $(date +%H:%M:%S) keeper: run complete (step $step)"
        break
    fi
    echo "== $(date +%H:%M:%S) keeper: step $step/$total; (re)launching"
    sh demo/run_umjs14.sh demo/umjs14 12 30 12 75 12 >> "$log" 2>&1 &
    SUP=$!
    sh scripts/umjs_watchdog.sh "$SUP" "$log" >> /tmp/umjs_watchdog.log 2>&1 &
    WD=$!
    wait "$SUP"
    rc=$?
    kill "$WD" 2>/dev/null
    if [ "$rc" -eq 42 ]; then
        echo "== keeper: NaN abort (deterministic); stopping"
        exit 42
    fi
    sleep 30
done
