#!/bin/bash
# Round-5 campaign, part 2 (after the interactive chip session).
# Reordered vs r5_campaign.sh: the short varlen sweep lands before the
# long fwd-variants sweep so a round-end cutoff keeps the rarer corpus
# keys. Same .done-marker resume protocol, one chip job at a time.
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

step 05b tune-bwd-variants-resume 14400 env FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=700 \
  python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks --full-tasks \
  --skip-stored --directions bwd --headdims 320 512 640 768 1024 \
  --seqlens 1024 2048 4096 8192 --H 32
step 08 tune-varlen 7200 python -m ffpa_attn_tpu.autotune --mode fast \
  --isolate-tasks --skip-stored --directions varlen --headdims 320 512 640 768 1024 \
  --seqlens 1024 2048 16384 --H 8
step 06 tune-fwd-variants 18000 env FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=500 \
  python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks --full-tasks \
  --skip-stored --directions fwd --headdims 320 512 640 768 1024 \
  --seqlens 1024 2048 4096 8192 --H 32
step 07 tune-16k-variants 10800 env FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=900 \
  python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks --full-tasks \
  --skip-stored --directions fwd bwd --headdims 320 512 1024 --seqlens 16384 --H 32

echo "== r5 campaign part 2 complete $(date +%H:%M:%S)"
