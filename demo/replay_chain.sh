#!/bin/bash
# Serialize demo/replay_hs.py variants on the single tunneled TPU, with
# retry on infra failure (the axon terminal wedges if two jax processes
# overlap, and occasionally drops mid-run).  ONE jax process at a time.
# Usage: bash demo/replay_chain.sh VARIANT[:NSTEPS[:CHUNK]] ...
cd /root/repo
for spec in "$@"; do
    IFS=: read -r v n c <<< "$spec"
    n=${n:-400}; c=${c:-24}
    for attempt in 1 2 3; do
        echo "== $(date +%H:%M:%S) replay $v nsteps=$n chunk=$c (attempt $attempt)"
        timeout 2400 python -u demo/replay_hs.py "$v" "$n" "$c" \
            > "/tmp/replay_${v}.log" 2>&1
        rc=$?
        tail -2 "/tmp/replay_${v}.log"
        # success = the probe printed its 'done' line (NaN abort still
        # prints it); anything else is infra -- cool off and retry
        if grep -q "^done" "/tmp/replay_${v}.log"; then break; fi
        echo "== $(date +%H:%M:%S) replay $v infra failure rc=$rc; cooling 120s"
        sleep 120
    done
done
echo "== chain done"
