#!/bin/bash
# Round-4 phase 2 (after the tuning/bench campaign): gate the paged-int8
# Mosaic fix on real hardware, then dissect the serving-tier slopes.
# Same marker pattern as r4_campaign.sh. ONE chip job at a time.
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

step 19 verify-r4 1800 python tools/verify_r4.py
step 20 device-paged-int8 1800 env FFPA_TPU_RUN_DEVICE_TESTS=1 \
  python -m pytest tests/test_on_device.py -k "paged" -q
step 21 probe-serving 3600 python tools/probe_serving.py
# Re-bench the D sweep with the RECOVERED max-mode entries (the published
# table ran on heuristics after the store merge dropped the sweep).
step 26 bench-multiD 5400 python -m ffpa_attn_tpu.bench --cases self-attn causal \
  --D 320 640 768 1024 --directions fwd bwd --output docs/bench_v5e_multiD.md

# Corpus breadth (VERDICT r3 item 5: 84 entries vs the reference's
# ~3,100/device): fast-mode sweeps over the remaining task grid. Each
# step merges incrementally, so a timeout still keeps what finished.
step 22 tune-n4096 6000 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --directions fwd bwd --headdims 320 512 640 768 1024 --seqlens 4096 --H 32
step 23 tune-gqa-full 7200 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --full-tasks --directions fwd bwd --headdims 320 512 768 --seqlens 8192 --H 32
step 24 tune-n16384 6000 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --directions fwd bwd --headdims 512 1024 --seqlens 16384 --H 32
step 25 tune-f16 5400 python -m ffpa_attn_tpu.autotune --mode fast --isolate-tasks \
  --dtypes float16 --directions fwd bwd --headdims 320 512 1024 --seqlens 8192 --H 32

echo "== r4 phase-2 complete $(date +%H:%M:%S)"
