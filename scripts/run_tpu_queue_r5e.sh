#!/bin/bash
# Round-5 queue, part 5: supertile A/B (spt 1/2/4 + i32 re-check), the
# fixed pad64/pack3 attention rows, then the stage-1 attribution rerun.
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }

log "queue r5e start"

timeout 3000 python scripts/probe_variants.py > /tmp/q5_variants2.log 2>&1
log "probe_variants exit=$? | $(grep 'grad=' /tmp/q5_variants2.log | tr '\n' ' ')"

timeout 1500 python scripts/probe_attnpack.py pad64 pack3 > /tmp/q5_attnpack3.log 2>&1
log "probe_attnpack exit=$? | $(grep 'TF/s' /tmp/q5_attnpack3.log | tr '\n' ' ' | tail -c 700)"

timeout 3000 python scripts/probe_stage1.py > /tmp/q5_stage1b.log 2>&1
log "probe_stage1 exit=$? | $(grep 'ms/step' /tmp/q5_stage1b.log | tr '\n' ' ')"

log "queue r5e done"
