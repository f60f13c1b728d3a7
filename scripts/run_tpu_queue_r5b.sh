#!/bin/bash
# Round-5 queue, part 2 (after the u16 table-gather flip): the pipeline
# refresh at production defaults, then the consolidated single-process
# probes (axon client init costs ~10 min per process — see NOTES).
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }

log "queue r5b start"

timeout 3300 python scripts/bench_pipeline.py > /tmp/q5_pipeline.log 2>&1
log "bench_pipeline exit=$? | $(tail -1 /tmp/q5_pipeline.log)"

timeout 1800 python scripts/probe_gnab.py > /tmp/q5_gnab.log 2>&1
log "probe_gnab exit=$? | $(grep 'gn=' /tmp/q5_gnab.log | tr '\n' ' ')"

timeout 1800 python scripts/probe_attnpack.py > /tmp/q5_attnpack.log 2>&1
log "probe_attnpack exit=$? | $(grep 'd=' /tmp/q5_attnpack.log | tr '\n' ' ')"

timeout 3000 python scripts/probe_stage1.py > /tmp/q5_stage1.log 2>&1
log "probe_stage1 exit=$? | $(grep 'ms/step' /tmp/q5_stage1.log | tr '\n' ' ')"

log "queue r5b done"
