#!/bin/bash
# Resilient on-TPU drain chain (round 5) — VERDICT-r4 value order.
#
# Same skeleton as drain_r4.sh (marker-resumable, probe-gated, .stop_drain
# kill switch, hard deadline so it cannot collide with the driver's
# round-end bench). One TPU process at a time (CLAUDE.md).
#
# Usage:   nohup bash scripts/queued/drain_r5.sh >/dev/null 2>&1 &
# Stop:    touch /root/repo/.stop_drain
# Status:  tail results/ondevice_r5/drain.log
set -u
REPO=/root/repo
OUT=$REPO/results/ondevice_r5
mkdir -p "$OUT"
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
echo $$ > "$OUT/drain.pid"

# Round is ~8h; leave >1.5h margin for the driver's round-end bench.
DEADLINE=$(( $(date +%s) + 21600 ))

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

stage_cpu() {  # no TPU probe; runs even during an outage
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

log "drain chain r5 starting (pid $$)"

for attempt in 1 2 3; do
  log "=== pass $attempt ==="

  # 1. Parity phase-4 (VERDICT #1+#2): slim2 — the untried width rung — at
  #    n=10 under protocol p2 (test 4096), exact re-paired; then the p2
  #    controls (v2 re-certification + neg_k8 power rail at n=5).
  #    Pre-declared in results/parity_r5/PHASE4.md.
  stage parity_p4_main 16200 \
    python scripts/parity_instrument.py --out results/parity_r5 \
      --epochs 60 --noise 0.05 --test 4096 --arms exact,slim2 --seeds 10
  stage parity_p4_ctrl 8100 \
    python scripts/parity_instrument.py --out results/parity_r5 \
      --epochs 60 --noise 0.05 --test 4096 --arms v2,neg_k8 --seeds 5
  stage_cpu parity_p4_aggregate 1200 \
    python scripts/parity_instrument.py --out results/parity_r5 \
      --aggregate-only --epochs 60 --test 4096 \
      --arms exact,slim2,v2,neg_k8

  # 2. Measured throughput for the phase-4 arms (adjudication input).
  stage preset_throughput_r5 7200 \
    python benchmarks/preset_throughput.py exact v2 slim2

  # 3. Mechanical bench-default adjudication on the p2 summary.
  if [ -e "$OUT/.done_preset_throughput_r5" ] \
     && [ -e "$OUT/.done_parity_p4_aggregate" ]; then
    stage_cpu adjudicate_r5 600 \
      python scripts/adjudicate_bench_default.py \
        --summary results/parity_r5/summary.json \
        --throughput "$OUT/preset_throughput_r5.log" --apply
  fi

  # 4. Round bench on the (possibly re-adjudicated) default.
  stage bench_default 7200 python bench.py

  # 5. Renderer fixed-vs-learned re-run on a de-saturated corpus
  #    (VERDICT #3): auto-calibrated ladder, then 2x5 paired seeds.
  stage renderer_views_r5 14400 \
    python scripts/renderer_views_instrument.py --auto-desaturate \
      --out results/renderer_views_r5

  # 6. HTTP front door measured on device (VERDICT #6).
  stage serve_http_bench 7200 python benchmarks/serve_http_bench.py

  # 7. On-TPU pytest (kernel parity / fused selection / export on-chip).
  stage pytest_tpu 14400 \
    env POINTVIT_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

  if ls "$OUT"/.done_parity_p4_main > /dev/null 2>&1 \
     && ls "$OUT"/.done_renderer_views_r5 > /dev/null 2>&1 \
     && ls "$OUT"/.done_pytest_tpu > /dev/null 2>&1; then
    log "all key stages done after pass $attempt"
    break
  fi
done

log "drain chain r5 exiting"
