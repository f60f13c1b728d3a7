#!/bin/bash
# Round-5 queue, part 6 (v2, f32 frozen params): full pipeline refresh,
# then the final cache warm, then the stage-1 attribution variants.
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }

log "queue r5f2 start"

timeout 5400 python scripts/bench_pipeline.py > /tmp/q5_pipeline4.log 2>&1
log "bench_pipeline exit=$? | $(grep 'stage\|pipeline' /tmp/q5_pipeline4.log | tr '\n' ' ' | tail -c 500)"

bash scripts/warm_cache.sh > /tmp/q5_warm.log 2>&1
log "warm_cache exit=$? | $(tail -c 300 /tmp/warm_bench.log 2>/dev/null)"

timeout 3000 python scripts/probe_stage1.py > /tmp/q5_stage1c.log 2>&1
log "probe_stage1 exit=$? | $(grep 'ms/step' /tmp/q5_stage1c.log | tr '\n' ' ')"

log "queue r5f2 done"
