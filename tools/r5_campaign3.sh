#!/bin/bash
# Round-5 campaign, part 3: runs after part 2's sweeps (05b/08/06).
# The f16 sweep lands BEFORE the f16/decode/headline regens so the
# round-5 dispatch fix (f16 primal dtype reaches the tuned-store query,
# commit 1dda4bf) has float16-keyed entries to serve. Regens last.
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

step 14 tune-f16 5400 env FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=600 \
  python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --skip-stored --directions fwd bwd --dtypes float16 \
  --headdims 320 512 --seqlens 1024 8192 --H 32
step 15 bench-decode 5400 python -m ffpa_attn_tpu.bench \
  --cases decode decode-gqa --directions fwd bwd --dtypes bfloat16 float16 \
  --output docs/bench_v5e_decode.md
step 16 bench-f16 7200 python -m ffpa_attn_tpu.bench \
  --cases self-attn cross-attn decode causal non-aligned \
  --directions fwd bwd --dtypes float16 \
  --output docs/bench_v5e_d512_n8192_f16.md
step 17 bench-headline 7200 python -m ffpa_attn_tpu.bench \
  --directions fwd bwd --dtypes bfloat16 \
  --output docs/bench_v5e_d512_n8192.md
step 18 bench-16k 5400 python -m ffpa_attn_tpu.bench --N 16384 \
  --cases self-attn causal gqa --directions fwd bwd \
  --output docs/bench_v5e_n16384.md --plot docs/ffpa_TPU_v5_lite_n16384.png

echo "== r5 campaign part 3 complete $(date +%H:%M:%S)"
