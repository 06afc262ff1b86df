#!/bin/sh
# Stage 2 of the round-3 TPU sequence: runs AFTER the 12-day UMJS14 keeper
# (scripts/umjs_keeper.sh) exits.  One jax process at a time, always.
#   1. A/B the slicing vs Pallas DSS on the real TPU (scripts/pallas_ab.py)
#      and pick the production DSS backend (speedup >1.15x AND state
#      equivalence <1e-5 on both the SW and EC stepped states)
#   2. roofline --write with the chosen backend
#   3. bench.py with the chosen backend
#   4. 20-day Held-Suarez run under the generic keeper
#
# Usage: sh scripts/tpu_stage2.sh <umjs_keeper_pid>
cd "$(dirname "$0")/.." || exit 1
log() { echo "== $(date +%H:%M:%S) $*"; }

[ -n "$1" ] && tail --pid="$1" -f /dev/null
log "UMJS14 keeper ($1) finished; TPU free"

log "pallas A/B"
timeout 2700 python -u scripts/pallas_ab.py sw ec sw48 > /tmp/ab_result.log 2>&1
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
    ok = all(r[k]['speedup'] > 1.15 and r[k]['state_relerr'] < 1e-5
             for k in ('sw', 'ec'))
    print(1 if ok else 0)
except Exception:
    print(0)
PY
)
fi
log "MIMSEM_PALLAS_DSS=$PD for production"
echo "$PD" > /tmp/pallas_decision
export MIMSEM_PALLAS_DSS=$PD

log "roofline --write"
timeout 2400 python -u scripts/roofline.py sw24 sw48 e3d16 e3d30 --write \
    > /tmp/roofline_run.log 2>&1
log "roofline rc=$?"

log "bench"
timeout 3600 python -u bench.py > /tmp/q_bench.log 2>&1
log "bench rc=$?"
tail -1 /tmp/q_bench.log

log "held-suarez 20-day keeper"
sh scripts/tpu_keeper.sh demo/held_suarez/checkpoint.npz 14400 /tmp/q_hs.log \
    python -u demo/run_held_suarez.py demo/held_suarez 6 16 20 120 24 \
    > /tmp/hs_keeper.log 2>&1
log "held-suarez rc=$?"
log "stage 2 done"
