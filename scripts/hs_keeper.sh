#!/bin/sh
# Keeper for the 100-day Held-Suarez climatology re-run (VERDICT r3 task 3)
# on the crash-prone tunneled TPU.  Same layering as scripts/umjs_keeper.sh:
# the driver (demo/run_held_suarez.py) checkpoints after every synced
# sub-chunk and self-tunes its dispatch length; this script relaunches it
# until the checkpoint reaches the full step count, kills a HUNG driver by
# pid when the log goes stale, and -- unlike the UMJS14 keeper -- carries a
# hard wall-clock DEADLINE so it can never hold the TPU into the driver's
# end-of-round bench.
#
# Usage: sh scripts/hs_keeper.sh [deadline_epoch_s]
cd "$(dirname "$0")/.." || exit 1
total=72000                       # 100 days at dt=120 s (eul/HeldSuarez.cpp:275-276)
log=/tmp/q_hs.log
out=demo/held_suarez
ck=$out/checkpoint.npz
deadline=${1:-$(( $(date +%s) + 5700 ))}

while :; do
    step=$(python -c "import numpy as np; \
print(int(np.load('$ck')['__step']))" 2>/dev/null || echo 0)
    if [ "$step" -ge "$total" ] || [ -f "$out/summary.txt" ]; then
        echo "== $(date +%H:%M:%S) hs_keeper: run complete (step $step)"
        break
    fi
    now=$(date +%s)
    if [ "$now" -ge "$deadline" ]; then
        echo "== $(date +%H:%M:%S) hs_keeper: deadline; stopping at step $step"
        break
    fi
    echo "== $(date +%H:%M:%S) hs_keeper: step $step/$total; (re)launching"
    HS_NEWTON_ITERS=${HS_NEWTON_ITERS:-4} HS_VERT_NEWTON=${HS_VERT_NEWTON:-chord} \
        timeout $((deadline - now)) \
        python demo/run_held_suarez.py "$out" 6 16 100 120 24 strang \
        >> "$log" 2>&1 &
    PID=$!
    while kill -0 "$PID" 2>/dev/null; do
        sleep 60
        now=$(date +%s)
        mt=$(stat -c %Y "$log" 2>/dev/null || echo "$now")
        if [ $((now - mt)) -gt 1800 ]; then
            echo "== $(date +%H:%M:%S) hs_keeper: driver stale; killing $PID"
            kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
        fi
    done
    wait "$PID"
    rc=$?
    if [ "$rc" -eq 42 ]; then
        echo "== hs_keeper: NaN abort (deterministic); stopping"
        exit 42
    fi
    sleep 15
done
