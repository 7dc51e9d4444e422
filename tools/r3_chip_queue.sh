#!/bin/bash
# Round-3 on-chip measurement campaign. ONE chip job at a time (axon tunnel
# exclusivity — see docs/env.md). Resumable: each step leaves a marker in
# tools/r3_logs/ and is skipped on re-run. Priority order follows
# VERDICT.md "Next round": tuned corpus for the ask shapes first, then the
# benchmark tables that gate on them, then breadth fill.
#
# Usage: bash tools/r3_chip_queue.sh [from_step]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOGS=/root/repo/tools/r3_logs
mkdir -p "$LOGS"
FROM=${1:-0}

step() {
  local n=$1 name=$2 cap=$3; shift 3
  local marker="$LOGS/$n.$name.done" log="$LOGS/$n.$name.log"
  if [ "$n" -lt "$FROM" ] || [ -e "$marker" ]; then
    echo "== [$n] $name: skip (done)"; return 0
  fi
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

# --- 0. sanity: chip reachable + public surface on real TPU ---
step 0 chip-sanity 300 python -c "import jax; print(jax.devices()); import jax.numpy as jnp; x=jnp.ones((256,256),jnp.bfloat16); print((x@x).block_until_ready().dtype)"
step 1 verify-surface 2400 python tools/verify_surface.py
step 2 device-tests 3600 env FFPA_TPU_RUN_DEVICE_TESTS=1 python -m pytest tests/test_on_device.py -x -q
# Feature tier (softcap/window/alibi/sinks) compiled by REAL Mosaic — the
# kernels only ran in interpret mode while the chip was down; catch any
# lowering rejection before the long tune steps.
step 23 verify-features 2400 python tools/verify_features.py
step 24 bench-features 4200 python -m ffpa_attn_tpu.bench \
  --cases sliding-window decode-gqa --directions fwd bwd \
  --output docs/bench_v5e_features.md

# --- 1. autotune: the VERDICT-ask shapes (max mode, isolated tasks) ---
# 16K backward (ask #1), D>=640 backward incl. accumulator-split A/B (#2)
step 3 tune-16k-bwd 5400 python -m ffpa_attn_tpu.autotune --mode max --isolate-tasks \
  --directions bwd --headdims 512 --seqlens 16384 --H 32
step 4 tune-bigD-bwd 7200 python -m ffpa_attn_tpu.autotune --mode max --isolate-tasks \
  --directions bwd --headdims 640 768 1024 --seqlens 4096 8192 --H 32
# cross-attn short-Nq (ask #3)
step 5 tune-cross 3600 python -m ffpa_attn_tpu.autotune --mode max --isolate-tasks \
  --cross-tasks --directions fwd bwd --headdims 512 1024 --seqlens 8192 --H 32
# fp16 lane (ask #4)
step 6 tune-fp16 3600 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --dtypes float16 --directions fwd bwd --headdims 512 --seqlens 4096 8192 --H 32
# decode + decode-gqa + mqa variants (ask #5, #7)
step 7 tune-decode 3600 python -m ffpa_attn_tpu.autotune --mode max --isolate-tasks \
  --full-tasks --directions decode --headdims 320 512 1024 --seqlens 4096 8192 16384 --H 32

# 16K component breakdown: attribute the 0.85x deficit (dS/dq-acc traffic
# exposure vs kernel inefficiency) before spending bench time on it
step 8 probe-16k-breakdown 3600 python tools/probe_16k_breakdown.py
# 16K hybrid (margin, scores, ds-limit) matrix: empirical best resident-head
# count + stripe width (feeds bench-16k)
step 9 probe-16k-hybrid 5400 python tools/probe_16k_hybrid.py

# --- 2. benchmark tables (consume the tuned entries above) ---
step 10 bench-d512 5400 python -m ffpa_attn_tpu.bench --directions fwd bwd \
  --output docs/bench_v5e_d512_n8192.md --plot docs/ffpa_TPU_v5_lite_speedup.png
step 11 bench-f16 5400 python -m ffpa_attn_tpu.bench --dtypes float16 --directions fwd bwd \
  --output docs/bench_v5e_d512_n8192_f16.md
step 12 bench-16k 4200 python -m ffpa_attn_tpu.bench --N 16384 \
  --cases self-attn causal gqa --directions fwd bwd \
  --output docs/bench_v5e_n16384.md --plot docs/ffpa_TPU_v5_lite_n16384.png
step 13 bench-multiD 7200 python -m ffpa_attn_tpu.bench --D 320 640 768 1024 \
  --cases self-attn causal --directions fwd bwd \
  --output docs/bench_v5e_multiD.md --plot docs/ffpa_TPU_v5_lite_multiD.png

# --- 3. e2e serving (batched-decode shared-row rewrite, ask #6) ---
step 14 bench-e2e 3600 python -m ffpa_attn_tpu.bench --e2e

# --- 4. corpus breadth fill (ask #7: >=200 entries) ---
step 15 tune-n2048 5400 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --directions fwd bwd --headdims 320 512 640 768 1024 --seqlens 2048 --H 32
step 16 tune-varlen 3600 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --directions varlen --headdims 320 512 640 768 1024 --seqlens 4096 8192 --H 8
step 17 tune-variants 7200 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --full-tasks --directions fwd bwd --headdims 512 --seqlens 2048 4096 16384 --H 32
step 18 tune-fwd-max 5400 python -m ffpa_attn_tpu.autotune --mode max --isolate-tasks \
  --directions fwd --headdims 640 768 --seqlens 4096 8192 16384 --H 32

# --- 5. stored-vs-fresh quality gate + driver contract ---
step 19 verify-store 5400 python -m ffpa_attn_tpu.autotune.verify \
  --headdims 512 1024 --seqlens 8192 --directions fwd bwd
step 20 bench-driver 1800 env FFPA_TPU_BENCH_SKIP_PREFLIGHT=1 python bench.py

# --- 6. beyond-reference serving tier ---
step 21 probe-paged 2400 python tools/probe_paged.py

echo "== campaign complete $(date +%H:%M:%S)"
