#!/bin/bash
# Resilient on-TPU drain chain (round 4).
#
# Replaces the /tmp waiter chain (parity_runner -> ondevice_r3 ->
# adjudicate/renderer -> r4_batch{,2,3}) that was lost to a /tmp wipe on
# 2026-08-19; lives in the repo so it survives the next one. Runs the
# TPU-queued work in VERDICT-r3 value order, strictly serialized (one TPU
# process at a time — CLAUDE.md), probing the tunnel before every stage
# with a hang-proof bounded matmul (the half-up relay makes bare python
# hang at import; `timeout` is the only reliable guard).
#
# Usage:   nohup bash scripts/queued/drain_r4.sh >/dev/null 2>&1 &
# Stop:    touch /root/repo/.stop_drain   (checked before every stage)
# Status:  tail results/ondevice_r4/drain.log
# Re-runs skip stages whose results/ondevice_r4/.done_<stage> marker exists.
set -u
REPO=/root/repo
OUT=$REPO/results/ondevice_r4
mkdir -p "$OUT"
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
echo $$ > "$OUT/drain.pid"

# Hard deadline: the round driver runs bench.py on the same single-process
# tunnel at round end (~12h); a colliding probe/stage can kill that run
# with INTERNAL errors (CLAUDE.md). Exit with >2h of margin.
DEADLINE=$(( $(date +%s) + 34200 ))

log() { echo "[$(date '+%m-%d %H:%M:%S')] $*" >> "$OUT/drain.log"; }

past_deadline() {
  [ "$(date +%s)" -ge "$DEADLINE" ] && { log "deadline reached; exiting"; return 0; }
  return 1
}

probe() {  # 0 iff a real device matmul completes (bounded: relay half-up hangs)
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /dev/null 2>&1
}

wait_for_tpu() {
  until probe; do
    [ -e "$REPO/.stop_drain" ] && { log "stop requested"; exit 0; }
    past_deadline && exit 0
    log "tunnel down; retry in 300s"
    sleep 300
  done
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2 rc
  shift 2
  [ -e "$OUT/.done_$name" ] && return 0
  [ -e "$REPO/.stop_drain" ] && { log "stop requested"; exit 0; }
  past_deadline && exit 0
  wait_for_tpu
  # A stage may not run past the deadline: cap its timeout to the time left.
  local left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 600 ] && { log "skip $name (<600s to deadline)"; exit 0; }
  [ "$tmo" -gt "$left" ] && tmo=$left
  log "start $name (timeout ${tmo}s)"
  if timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1; then
    touch "$OUT/.done_$name"
    log "done  $name"
  else
    rc=$?
    log "FAIL  $name rc=$rc"
  fi
}

# CPU-only stage: no TPU probe, runs even during an outage.
stage_cpu() {
  local name=$1 tmo=$2 rc
  shift 2
  [ -e "$OUT/.done_$name" ] && return 0
  log "start $name (cpu, timeout ${tmo}s)"
  if timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1; then
    touch "$OUT/.done_$name"
    log "done  $name"
  else
    rc=$?
    log "FAIL  $name rc=$rc"
  fi
}

log "drain chain starting (pid $$)"

for attempt in 1 2 3; do
  log "=== pass $attempt ==="

  # 1. Parity instrument phase-2 to full power (VERDICT #5): finish the
  #    truncated stack_seed4 + run neg_k8_seed4, then rebuild the full
  #    summary (all arms) from disk. Protocol flags must match summary.json.
  stage parity_finish 10800 \
    python scripts/parity_instrument.py --out results/parity_r3 \
      --epochs 60 --noise 0.05 --batch 256 --arms stack,neg_k8 --seeds 5
  stage parity_aggregate 1200 \
    python scripts/parity_instrument.py --out results/parity_r3 \
      --aggregate-only --epochs 60 \
      --arms slim,v2,k24,g160,slim_k24,stack,neg_k8

  # 2. Measured per-arm throughput (feeds the bench-default adjudication).
  stage preset_throughput 10800 \
    python benchmarks/preset_throughput.py exact slim v2 slim_k24

  # 3. Mechanical bench-default adjudication (VERDICT #1c). CPU-only, but
  #    gated on stage 2's output existing.
  if [ -e "$OUT/.done_preset_throughput" ]; then
    stage_cpu adjudicate 600 \
      python scripts/adjudicate_bench_default.py \
        --summary results/parity_r3/summary.json \
        --throughput "$OUT/preset_throughput.log" --apply
  fi

  # 4. Round bench numbers: adjudicated default + exact + v2.
  stage bench_default 7200 python bench.py
  stage bench_exact 7200 env POINTVIT_BENCH_EXACT=1 python bench.py
  stage bench_v2 7200 env POINTVIT_BENCH_PRESET=v2 python bench.py

  # 5. Training-step ledger incl. the flash-attention backward (VERDICT r3 #5
  #    weak item: the est. ~100 ms saving has never been measured).
  stage train_step_bench 10800 python benchmarks/train_step_bench.py

  # 6. Pix4Point ~2x harvest (VERDICT #3): anatomy (fused-vs-attn arms) +
  #    end-to-end fused-block number.
  stage pix4point_anatomy 10800 python benchmarks/pix4point_anatomy.py
  stage pix4point_bench 7200 python benchmarks/pix4point_bench.py
  stage pix4point_train_bench 10800 python benchmarks/pix4point_train_bench.py

  # 7. Renderer fused serial-adapter trunk measurement (r4 kernel).
  stage renderer_fused_bench 7200 python benchmarks/renderer_fused_bench.py

  # 8. On-TPU pytest: fused kernel parity/selection on the real chip
  #    (incl. the r4 fused-block, checkpoint and export on-device tests).
  stage pytest_tpu 14400 \
    env POINTVIT_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

  # 9. Renderer fixed-vs-learned views instrument (VERDICT #4): 2x5 paired
  #    seeds. Longest stage; last so everything above lands first.
  stage renderer_views 28800 \
    python scripts/renderer_views_instrument.py --out results/renderer_views_r3

  # Serving-engine per-bucket bench (r4 serving engine, nice-to-have).
  stage serve_bench 7200 python benchmarks/serve_bench.py

  missing=$(ls "$OUT" | grep -c '^\.done_' || true)
  all=$(grep -c '^  stage\|^  stage_cpu' "$0" || true)
  if ls "$OUT"/.done_renderer_views > /dev/null 2>&1 \
     && ls "$OUT"/.done_pytest_tpu > /dev/null 2>&1 \
     && ls "$OUT"/.done_parity_finish > /dev/null 2>&1; then
    log "all key stages done after pass $attempt"
    break
  fi
done

log "drain chain exiting"
