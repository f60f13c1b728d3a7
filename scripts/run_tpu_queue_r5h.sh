#!/bin/bash
# Round-5 queue, part 8: stage-1 attribution variants (after the 0-d
# donation fix; full row already measured at 448-467 ms/step).
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }
log "queue r5h start"
timeout 3000 python scripts/probe_stage1.py > /tmp/q5_stage1c.log 2>&1
log "probe_stage1 exit=$? | $(grep 'ms/step' /tmp/q5_stage1c.log | tr '\n' ' ')"
log "queue r5h done"
