#!/bin/bash
# Post-drain tail (round 5): if the main drain chain's deadline cut the
# renderer-views / HTTP-bench / pytest stages, finish whatever fits in the
# remaining margin. Launch MANUALLY with the number of seconds it may use:
#
#     nohup bash scripts/queued/renderer_tail_r5.sh 3600 >/dev/null 2>&1 &
#
# Waits for the main drain to exit first (one TPU process at a time),
# reuses its markers/out dir, honours .stop_drain, and bounds every stage
# to the given budget so it cannot collide with the driver's round-end
# bench.
set -u
REPO=/root/repo
OUT=$REPO/results/ondevice_r5
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
BUDGET=${1:?usage: renderer_tail_r5.sh <seconds>}
DEADLINE=$(( $(date +%s) + BUDGET ))

log() { echo "[$(date '+%m-%d %H:%M:%S')] $*" >> "$OUT/drain.log"; }

# Wait (bounded) for the main drain to release the TPU.
if [ -f "$OUT/drain.pid" ]; then
  while kill -0 "$(cat "$OUT/drain.pid")" 2>/dev/null; do
    [ "$(date +%s)" -ge "$DEADLINE" ] && { log "tail: budget spent waiting"; exit 0; }
    sleep 60
  done
fi
log "tail chain starting (pid $$, budget ${BUDGET}s)"

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /dev/null 2>&1
}

stage() {
  local name=$1 tmo=$2 rc
  shift 2
  [ -e "$OUT/.done_$name" ] && return 0
  [ -e "$REPO/.stop_drain" ] && { log "tail: stop requested"; exit 0; }
  local left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 600 ] && { log "tail: skip $name (<600s left)"; return 0; }
  [ "$tmo" -gt "$left" ] && tmo=$left
  until probe; do
    left=$(( DEADLINE - $(date +%s) ))
    [ "$left" -lt 600 ] && { log "tail: tunnel down, out of budget"; exit 0; }
    log "tail: tunnel down; retry in 120s"
    sleep 120
  done
  log "tail start $name (timeout ${tmo}s)"
  if timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1; then
    touch "$OUT/.done_$name"
    log "tail done  $name"
  else
    rc=$?
    log "tail FAIL  $name rc=$rc"
  fi
}

stage renderer_views_r5 14400 \
  python scripts/renderer_views_instrument.py --auto-desaturate \
    --out results/renderer_views_r5
# aggregate whatever complete paired seeds exist, even if the stage above
# was cut mid-seed (marker-independent: cheap, always safe to re-run)
timeout 900 python scripts/renderer_views_instrument.py --auto-desaturate \
  --aggregate-only --out results/renderer_views_r5 \
  >> "$OUT/renderer_views_r5_aggregate.log" 2>&1 \
  && log "tail: renderer aggregate refreshed"
stage serve_http_bench 7200 python benchmarks/serve_http_bench.py
# the new default's training-step number (slim2 became bench default r5)
stage train_step_slim2 5400 python benchmarks/train_step_bench.py slim2 v2
# re-measure the front door with the r5 binary-response negotiation
# (the first measurement showed float64-JSON logits dominate round-trips)
stage serve_http_bench_npy 5400 python benchmarks/serve_http_bench.py
stage pytest_tpu 14400 \
  env POINTVIT_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
log "tail chain exiting"
