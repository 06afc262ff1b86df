#!/bin/sh
# Round-5 TPU work queue: runs after the Held-Suarez keeper exits.
# One jax process at a time (the axon terminal wedges on overlap); every
# stage is timeout-bounded and logged; failures don't block later stages.
cd "$(dirname "$0")/.." || exit 1

# wait for the HS keeper (and any driver it spawned) to finish
while [ -f /tmp/hs_wait.pid ] && kill -0 "$(cat /tmp/hs_wait.pid)" 2>/dev/null; do
    sleep 60
done
sleep 30

probe() {
    timeout 90 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128))))
print('tpu-ok')" 2>/dev/null | grep -q tpu-ok
}
wait_tpu() {
    while ! probe; do
        echo "== $(date +%H:%M:%S) tpu down; sleeping 180"
        sleep 180
    done
}

echo "== $(date +%H:%M:%S) stage 1: UMJS14 production budget closure"
wait_tpu
timeout 1800 python -u demo/closure_umjs14.py 5 12 > /tmp/closure_umjs14.log 2>&1
echo "   rc=$?"

echo "== $(date +%H:%M:%S) stage 2: UMJS14 escalation-at-defaults replay"
wait_tpu
timeout 2400 python -u demo/replay_umjs14.py demo/umjs14/checkpoint.npz \
    --steps 120 --iters 4 > /tmp/replay_esc.log 2>&1
echo "   rc=$?"

echo "== $(date +%H:%M:%S) stage 3: mountain wave 6 h"
wait_tpu
rm -f demo/mountain_wave/checkpoint.npz demo/mountain_wave/tuner.json
timeout 3600 python -u demo/run_mountain_wave.py > /tmp/mwave.log 2>&1
echo "   rc=$?"

echo "== $(date +%H:%M:%S) stage 4: bubble NK=150 reference scale"
for i in 1 2 3; do
    wait_tpu
    timeout 5400 python -u demo/run_bubble.py > /tmp/bubble.log 2>&1
    rc=$?
    echo "   attempt $i rc=$rc"
    [ "$rc" -eq 0 ] && break
    [ "$rc" -eq 42 ] && break        # NaN: deterministic, do not loop
done

echo "== $(date +%H:%M:%S) stage 5: bench A/B concat DSS"
wait_tpu
timeout 1800 python bench.py > /tmp/bench_slice.json 2>/tmp/bench_slice.err
echo "   slice rc=$?"
wait_tpu
MIMSEM_CONCAT_DSS=1 timeout 1800 python bench.py > /tmp/bench_concat.json 2>/tmp/bench_concat.err
echo "   concat rc=$?"
echo "== $(date +%H:%M:%S) queue done"
