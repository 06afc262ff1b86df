#!/bin/sh
# Generic keeper for long checkpointed TPU runs on the crash-prone tunnel:
# relaunch the driver until its checkpoint reaches the target step count,
# with a pid-scoped stale-log watchdog (never name/pattern matching).
# The driver must checkpoint monotonically (demo/run_umjs14.py pattern) and
# exit 42 on a deterministic NaN blowup.
#
# Usage: sh scripts/tpu_keeper.sh <ckpt.npz> <total_steps> <log> <cmd...>
cd "$(dirname "$0")/.." || exit 1
ck="$1"; total="$2"; log="$3"; shift 3

tries=0
while [ "$tries" -lt 48 ]; do
    step=$(python -c "import numpy as np; \
print(int(np.load('$ck')['__step']))" 2>/dev/null || echo 0)
    if [ "$step" -ge "$total" ]; then
        echo "== $(date +%H:%M:%S) keeper: complete (step $step/$total)"
        exit 0
    fi
    echo "== $(date +%H:%M:%S) keeper: step $step/$total; launching: $*"
    "$@" >> "$log" 2>&1 &
    DRV=$!
    # stale-log watchdog on the driver pid
    (
        while kill -0 "$DRV" 2>/dev/null; do
            sleep 60
            now=$(date +%s)
            mt=$(stat -c %Y "$log" 2>/dev/null || echo "$now")
            if [ $((now - mt)) -gt 900 ]; then
                echo "== $(date +%H:%M:%S) keeper-watchdog: log stale; kill $DRV"
                kill "$DRV" 2>/dev/null; sleep 10; kill -9 "$DRV" 2>/dev/null
            fi
        done
    ) &
    WD=$!
    wait "$DRV"
    rc=$?
    kill "$WD" 2>/dev/null
    if [ "$rc" -eq 0 ]; then
        echo "== $(date +%H:%M:%S) keeper: driver finished cleanly"
        exit 0
    fi
    if [ "$rc" -eq 42 ]; then
        echo "== keeper: NaN abort (deterministic); stopping"
        exit 42
    fi
    tries=$((tries + 1))
    echo "== $(date +%H:%M:%S) keeper: driver rc=$rc (try $tries); retry in 30 s"
    sleep 30
done
echo "== keeper: giving up after $tries tries"
exit 1
