#!/bin/sh
# Staged TPU production sequence for the tunneled single-chip environment
# (see ROOFLINE.md and the memory notes in demo/run_umjs14.py): the tunnel
# drops for hours at a time, so every stage is resumable and artifact
# capture is interleaved with the long flagship run.
#
#   1. wait for the remote-compile endpoint + a real matmul sanity check
#   2. A/B the slicing vs Pallas DSS (scripts/pallas_ab.py) and pick the
#      production DSS backend from measured speedup + state equivalence
#   3. UMJS14 12-day run, first in a bounded 90-min window (checkpointed
#      at every dump + mid-interval; timeout only pauses it)
#   4. roofline + bench artifacts while the checkpoint is safe
#   5. resume UMJS14 unbounded under the stale-log watchdog
#      (scripts/umjs_watchdog.sh)
cd /root/repo || exit 1
log() { echo "== $(date +%H:%M:%S) $*"; }

while true; do
    code=$(curl -s -m 4 -o /dev/null -w "%{http_code}" http://127.0.0.1:8083/ 2>/dev/null)
    if [ "$code" != "000" ] && [ -n "$code" ]; then
        log "endpoint up ($code); TPU sanity"
        if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256)); print('matmul ok', float((x@x)[0,0]))"; then
            break
        fi
        log "sanity failed; retry in 60s"
    fi
    sleep 45
done

log "running pallas A/B"
timeout 2700 python -u scripts/pallas_ab.py sw ec > /tmp/ab_result.log 2>&1
rc=$?
tail -8 /tmp/ab_result.log
log "A/B rc=$rc"

PD=0
if [ "$rc" -eq 0 ]; then
    PD=$(python - <<'PY'
import json
try:
    line = [l for l in open('/tmp/ab_result.log') if l.startswith('{')][-1]
    r = json.loads(line)
    ok = all(v['speedup'] > 1.15 and v['state_relerr'] < 1e-5
             for v in r.values())
    print(1 if ok else 0)
except Exception:
    print(0)
PY
)
fi
log "MIMSEM_PALLAS_DSS=$PD for production"
echo "$PD" > /tmp/pallas_decision
export MIMSEM_PALLAS_DSS=$PD

log "UMJS14 window 1 (<=90 min)"
rm -f demo/umjs14/*    # fresh 12-day run: clear the restored r2 gallery
timeout 5400 sh demo/run_umjs14.sh demo/umjs14 12 30 12 75 12 \
    > /tmp/q_umjs14.log 2>&1
log "window 1 rc=$? (124 = window elapsed, checkpoint preserved)"
tail -3 /tmp/q_umjs14.log

log "roofline --write"
timeout 2400 python -u scripts/roofline.py sw24 sw48 e3d16 e3d30 --write \
    > /tmp/roofline_run.log 2>&1
log "roofline rc=$?"

log "bench"
timeout 2400 python -u bench.py > /tmp/q_bench.log 2>&1
log "bench rc=$?"
tail -1 /tmp/q_bench.log

log "UMJS14 window 2 (resume, unbounded)"
sh demo/run_umjs14.sh demo/umjs14 12 30 12 75 12 >> /tmp/q_umjs14.log 2>&1 &
SUP=$!
sh scripts/umjs_watchdog.sh "$SUP" /tmp/q_umjs14.log > /tmp/umjs_watchdog.log 2>&1 &
log "supervisor pid $SUP; staged sequence done"
