#!/bin/bash
# Round-5 queue, part 6: sort-VJP A/B first (decides a default flip),
# then the full-pipeline rerun (gs donation fix + bf16 frozen params =
# the production load regime), the stage-2 attention-budget A/B, and the
# end-of-round cache warm for the driver bench.
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }

log "queue r5f start"

timeout 2400 python scripts/probe_variants.py > /tmp/q5_variants3.log 2>&1
log "probe_variants exit=$? | $(grep 'grad=' /tmp/q5_variants3.log | tr '\n' ' ')"

timeout 5400 python scripts/bench_pipeline.py > /tmp/q5_pipeline3.log 2>&1
log "bench_pipeline exit=$? | $(grep 'stage\|pipeline' /tmp/q5_pipeline3.log | tr '\n' ' ' | tail -c 500)"

GIP_ATTN_SCORE_BYTES=5e9 timeout 3600 python scripts/bench_pipeline.py 2 \
    > /tmp/q5_stage2b.log 2>&1
log "stage2 5e9 exit=$? | $(grep 'stage2' /tmp/q5_stage2b.log | tr '\n' ' ')"

log "queue r5f done"
