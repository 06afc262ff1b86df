#!/bin/bash
# Run a sequence of hs_probe variants on the TPU, one at a time.
# Usage: bash demo/probe_chain.sh VARIANT[:NSTEPS[:CHUNK]] ...
cd /root/repo
for spec in "$@"; do
    IFS=: read -r v n c <<< "$spec"
    n=${n:-720}; c=${c:-48}
    echo "== $(date +%H:%M:%S) probe $v nsteps=$n chunk=$c"
    timeout 1500 python -u demo/hs_probe.py "$v" "$n" "$c" \
        > /tmp/probe_${v}.log 2>&1
    echo "== $(date +%H:%M:%S) probe $v exit $? -> /tmp/probe_${v}.log"
    tail -3 /tmp/probe_${v}.log
done
echo "== chain done"
