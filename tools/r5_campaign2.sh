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

# Fresh e2e with per-bench subprocess isolation (57fc33d) + the scan-based
# speculative loop (897cba5): step 01 predates both, so its paged/spec rows
# are one InvalidArgument cascade, not measurements.
step 09 bench-e2e-iso 4500 python -m ffpa_attn_tpu.bench --e2e

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

# Post-sweep regens: tables whose tuned winners the sweeps above may have
# moved, plus the two docs whose stale rows predate the round-5 decode
# composite (bench_v5e_d512_n8192_f16.md decode row, bench_v5e_decode.md).
step 10 bench-decode 5400 python -m ffpa_attn_tpu.bench \
  --cases decode decode-gqa --directions fwd bwd --dtypes bfloat16 float16 \
  --output docs/bench_v5e_decode.md
step 11 bench-f16 7200 python -m ffpa_attn_tpu.bench \
  --cases self-attn cross-attn decode causal non-aligned \
  --directions fwd bwd --dtypes float16 \
  --output docs/bench_v5e_d512_n8192_f16.md
step 12 bench-headline 7200 python -m ffpa_attn_tpu.bench \
  --directions fwd bwd --dtypes bfloat16 \
  --output docs/bench_v5e_d512_n8192.md
step 13 bench-16k 5400 python -m ffpa_attn_tpu.bench --N 16384 \
  --cases self-attn causal gqa --directions fwd bwd \
  --output docs/bench_v5e_n16384.md --plot docs/ffpa_TPU_v5_lite_n16384.png

echo "== r5 campaign part 2 complete $(date +%H:%M:%S)"
