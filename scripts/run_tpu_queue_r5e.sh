#!/bin/bash
# Round-5 queue, part 5: supertile A/B (spt 1/2/4 + i32 re-check at the
# new defaults), then the stage-1 attribution rerun (donation fix).
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }

log "queue r5e start"

timeout 3000 python scripts/probe_variants.py > /tmp/q5_variants2.log 2>&1
log "probe_variants exit=$? | $(grep 'grad=' /tmp/q5_variants2.log | tr '\n' ' ')"

timeout 3000 python scripts/probe_stage1.py > /tmp/q5_stage1b.log 2>&1
log "probe_stage1 exit=$? | $(grep 'ms/step' /tmp/q5_stage1b.log | tr '\n' ' ')"

log "queue r5e done"
