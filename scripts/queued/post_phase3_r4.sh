#!/bin/bash
# Post-phase-3 on-device chain (r4). Run AFTER scripts/parity_instrument.py
# finishes the phase-3 seeds (results/ondevice_r4/parity_phase3.log ends with
# rc=0). Serialized: one TPU process at a time; probe-gated between stages
# because the tunnel flaps for ~5-10 min after each big process exits.
#
# Stages (marker-resumable in results/ondevice_r4/):
#   1. full re-aggregation of summary.json over ALL arms (CPU-cheap but uses
#      the same script; runs with --aggregate-only)
#   2. preset_throughput for stack + v3 (+ v2 re-confirm)
#   3. adjudicate_bench_default --apply
#   4. bench.py default confirm
#   5. train_step_bench v2 + v3
set -u
cd /root/repo
OUT=results/ondevice_r4
mkdir -p "$OUT"

probe() {
  for i in $(seq 1 60); do
    timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 && return 0
    sleep 30
  done
  echo "probe never recovered" >&2
  return 1
}

stage() { # stage <name> <cmd...>
  local name=$1; shift
  [ -e "$OUT/.done_$name" ] && { echo "[skip] $name"; return 0; }
  probe || return 1
  echo "[run ] $name"
  if timeout 7200 "$@" > "$OUT/$name.log" 2>&1; then
    touch "$OUT/.done_$name"
  else
    echo "[FAIL] $name rc=$?" | tee -a "$OUT/$name.log"
    return 1
  fi
}

stage phase3_aggregate python scripts/parity_instrument.py --aggregate-only \
  --arms exact,slim,v2,k24,g160,slim_k24,stack,neg_k8,v3 \
  --epochs 60 --noise 0.05 --out results/parity_r3

stage preset_throughput_p3 python benchmarks/preset_throughput.py v2 stack v3

stage adjudicate_p3 python scripts/adjudicate_bench_default.py --apply \
  --summary results/parity_r3/summary.json \
  --throughput "$OUT/preset_throughput_p3.log"

stage bench_default_p3 python bench.py

stage train_step_p3 python benchmarks/train_step_bench.py v2 v3

echo "post-phase3 chain complete"
