#!/bin/bash
# Round-5 queue, part 7 (final): pre-warm the compile cache at the FINAL
# defaults so the driver's budgeted bench run hits warm compiles.
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }
log "queue r5g start"
bash scripts/warm_cache.sh > /tmp/q5_warm.log 2>&1
log "warm_cache exit=$? | $(tail -c 300 /tmp/warm_bench.log 2>/dev/null)"
log "queue r5g done"
