#!/bin/bash
# Round-5 queue, part 10: compositor chunk-size A/B (64/128/256).
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }
log "queue r5j start"
timeout 2400 python scripts/probe_variants.py > /tmp/q5_variants4.log 2>&1
log "probe_variants exit=$? | $(grep 'grad=' /tmp/q5_variants4.log | tr '\n' ' ')"
log "queue r5j done"
