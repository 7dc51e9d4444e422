#!/bin/bash
# Round-4 on-chip campaign (after the multiD bench + max-mode D-sweep that
# ran first): regenerate the round-2/3-stale tables under the
# materializing protocol, re-probe the 16K levers with the FIXED fp8-dS
# wiring (a dead flag before round 4), then corpus breadth. Ordered by
# VERDICT priority so a timeout leaves the most valuable artifacts done.
# ONE chip job at a time (axon tunnel exclusivity). Resumable via markers.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOGS=/root/repo/tools/r4_logs
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

# Non-pow2 LANE-multiple blocks entered _MAX_BLOCKS in round 4: re-sweep
# the flagship D=512 and the VMEM-tight D=1024 with the extended ladder.
step 035 tune-nonpow2 5400 env FFPA_TPU_AUTOTUNE_MAX_CONFIGS=30 \
  FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=1200 FFPA_TPU_ALLOW_FP8_DS=1 \
  python -m ffpa_attn_tpu.autotune --mode max --isolate-tasks \
  --directions fwd bwd --headdims 512 1024 --seqlens 8192 --H 32
step 04 bench-d512 7200 python -m ffpa_attn_tpu.bench --directions fwd bwd \
  --output docs/bench_v5e_d512_n8192.md --plot docs/ffpa_TPU_v5_lite_speedup.png
step 07 bench-f16 4500 python -m ffpa_attn_tpu.bench --dtypes float16 --directions fwd bwd \
  --cases self-attn cross-attn decode causal non-aligned \
  --output docs/bench_v5e_d512_n8192_f16.md
step 06 bench-16k 4500 python -m ffpa_attn_tpu.bench --N 16384 \
  --cases self-attn causal gqa --directions fwd bwd \
  --output docs/bench_v5e_n16384.md --plot docs/ffpa_TPU_v5_lite_n16384.png
step 08 bench-e2e 3000 python -m ffpa_attn_tpu.bench --e2e
step 09 tune-n2048 6000 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --directions fwd bwd --headdims 320 512 640 768 1024 --seqlens 2048 --H 32
step 10 tune-decode-max 5400 env FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=600 \
  python -m ffpa_attn_tpu.autotune --mode max --isolate-tasks --full-tasks \
  --directions decode --headdims 320 512 640 768 1024 \
  --seqlens 2048 4096 8192 16384 --H 32
step 11 tune-varlen 4500 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --directions varlen --headdims 320 512 640 768 1024 --seqlens 4096 8192 --H 8
# After the decode max-mode sweep so the rows carry the tuned entries AND
# the round-4 composite-vjp decode backward (the d512/f16 tables' decode
# bwd rows predate it).
step 12 bench-decode-tuned 3000 python -m ffpa_attn_tpu.bench \
  --dtypes bfloat16 float16 --cases decode decode-gqa --directions fwd bwd \
  --output docs/bench_v5e_decode.md
# Lowest priority: the lever matrix already ran as 01.probe_16k.log (self +
# causal complete; conclusions in design.md). This re-run only adds the gqa
# rows the first pass lost to the enable_gqa probe bug.
step 05 probe-16k-fp8 3600 env FFPA_TPU_PROBE_CASES=gqa python tools/r4_probe_16k.py

echo "== r4 campaign complete $(date +%H:%M:%S)"
