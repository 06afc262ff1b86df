#!/bin/sh
# Wait for the tunneled TPU to come back (it wedges for stretches at a
# time), then start the fresh 100-day Held-Suarez run with the theta
# biharmonic active.  A health probe with a hard timeout is the only
# reliable liveness signal: jax.devices() succeeds even when dispatch
# hangs.  One jax process at a time -- never start while another holds
# the axon terminal.
#
# Usage: sh scripts/wait_tpu_then_hs.sh [deadline_epoch_s]
cd "$(dirname "$0")/.." || exit 1
out=demo/held_suarez

while :; do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128))))
print('tpu-ok')" 2>/dev/null | grep -q tpu-ok; then
        break
    fi
    echo "== $(date +%H:%M:%S) tpu still down; sleeping 180"
    sleep 180
done
echo "== $(date +%H:%M:%S) TPU healthy; launching HS keeper"

# fresh trajectory: the old checkpoint/energetics belong to the no-tv run
# that collapsed at day 20.4 (preserved in git history)
rm -f "$out/checkpoint.npz" "$out/tuner.json" "$out/nan_state.npz"
mv -f "$out/energetics.dat" "$out/energetics_notv_day20.dat" 2>/dev/null
rm -f "$out"/layers_*.npz
: > /tmp/q_hs.log
exec sh scripts/hs_keeper.sh "$@"
