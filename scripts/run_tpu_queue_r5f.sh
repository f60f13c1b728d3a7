#!/bin/bash
# Round-5 queue, part 6: stage-2 attention-budget A/B (bf16 frozen params
# free ~2.5 GB; a 5e9 score budget un-chunks the 64^2 self-attention —
# probe_refinemem says it fits), then end-of-round cache warm for the
# driver's bench run.
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }

log "queue r5f start"

GIP_ATTN_SCORE_BYTES=5e9 timeout 3600 python scripts/bench_pipeline.py 2 \
    > /tmp/q5_stage2b.log 2>&1
log "stage2 5e9 exit=$? | $(grep 'stage2' /tmp/q5_stage2b.log | tr '\n' ' ')"

bash scripts/warm_cache.sh > /tmp/q5_warm.log 2>&1
log "warm_cache exit=$? | $(tail -c 300 /tmp/warm_bench.log)"

log "queue r5f done"
