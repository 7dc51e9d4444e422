#!/bin/bash
# Poll the axon tunnel; when a trivial matmul succeeds, run the r3 campaign.
# ONE probe at a time (tunnel exclusivity — docs/env.md). Resumable: the
# campaign script skips steps with .done markers.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOGS=/root/repo/tools/r3_logs
mkdir -p "$LOGS"
for i in $(seq 1 500); do
  if timeout 240 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256),jnp.bfloat16); (x@x).block_until_ready()" >/dev/null 2>&1; then
    echo "chip up at $(date)" | tee -a "$LOGS/watch.log"
    bash tools/r3_chip_queue.sh 2>&1 | tee "$LOGS/campaign_console.log"
    echo "campaign exited at $(date)" | tee -a "$LOGS/watch.log"
    exit 0
  fi
  echo "probe $i failed $(date +%H:%M:%S)" >> "$LOGS/watch.log"
  sleep 90
done
echo "chip never came up" | tee -a "$LOGS/watch.log"
exit 1
