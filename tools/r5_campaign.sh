#!/bin/bash
# Round-5 on-chip campaign, ordered by VERDICT r4 priority so a timeout
# leaves the most valuable artifacts done. ONE chip job at a time (axon
# tunnel exclusivity). Resumable via .done markers.
#
#  1. e2e tokens/s — serving fixes (jitted prefills), int8 page256 fix,
#     shallow-draft speculative (VERDICT items 3, 4, 8).
#  2. 16K lever probe GQA rows the round-4 pass lost (item 5).
#  3. multiD bench run to COMPLETION incl. D=1024 (item 2).
#  4. decode corpus: gqa variants backing the decode-bwd fix (item 6).
#  5. bwd/fwd --full-tasks corpus breadth at every grid point (item 6).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOGS=/root/repo/tools/r5_logs
mkdir -p "$LOGS"

step() {
  local n=$1 name=$2 cap=$3; shift 3
  local marker="$LOGS/$n.$name.done" log="$LOGS/$n.$name.log"
  if [ -e "$marker" ]; then echo "== [$n] $name: skip (done)"; return 0; fi
  echo "== [$n] $name: start $(date +%H:%M:%S) cap=${cap}s"
  timeout "$cap" "$@" >"$log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then
    touch "$marker"; echo "== [$n] $name: OK $(date +%H:%M:%S)"
  else
    echo "== [$n] $name: rc=$rc (log: $log) — continuing"
  fi
  return 0
}

step 01 bench-e2e 4500 python -m ffpa_attn_tpu.bench --e2e
step 02 probe-16k-gqa 5400 env FFPA_TPU_PROBE_CASES=gqa \
  python tools/r4_probe_16k.py
step 03 bench-multiD 10800 python -m ffpa_attn_tpu.bench \
  --cases self-attn causal --directions fwd bwd --D 320 640 768 1024 \
  --output docs/bench_v5e_multiD.md --plot docs/ffpa_TPU_v5_lite_multiD.png
step 04 tune-decode-gqa 7200 env FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=600 \
  python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks --full-tasks \
  --directions decode --headdims 320 512 640 768 1024 \
  --seqlens 1024 2048 4096 8192 16384 --H 32
step 05 tune-bwd-variants 21600 env FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=700 \
  python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks --full-tasks \
  --directions bwd --headdims 320 512 640 768 1024 \
  --seqlens 1024 2048 4096 8192 --H 32
step 06 tune-fwd-variants 18000 env FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=500 \
  python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks --full-tasks \
  --directions fwd --headdims 320 512 640 768 1024 \
  --seqlens 1024 2048 4096 8192 --H 32
step 07 tune-16k-variants 10800 env FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=900 \
  python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks --full-tasks \
  --directions fwd bwd --headdims 320 512 1024 --seqlens 16384 --H 32
step 08 tune-varlen 7200 python -m ffpa_attn_tpu.autotune --mode fast \
  --isolate-tasks --directions varlen --headdims 320 512 640 768 1024 \
  --seqlens 1024 2048 16384 --H 8

echo "== r5 campaign complete $(date +%H:%M:%S)"
