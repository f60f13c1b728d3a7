#!/bin/bash
# Round-5 queue, part 3 (after the loser deletions + stage-2 OOM fix):
# 1. bench_pipeline full 3-stage refresh (VERDICT #2 — the north star)
# 2. probe_gnab naive arm (the fast rows already measured: vae 222.77,
#    unet 149.44 — only the flax-GroupNorm comparison rows are missing)
# 3. probe_attnpack (attention head-padding, VERDICT #5)
# 4. probe_stage1 (stage-1 step attribution, VERDICT #7)
# Each step logs to /tmp/q5_<name>.log; progress to /tmp/tpu_queue5.log.
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }

log "queue r5c start"

timeout 4500 python scripts/bench_pipeline.py > /tmp/q5_pipeline.log 2>&1
log "bench_pipeline exit=$? | $(tail -1 /tmp/q5_pipeline.log)"

timeout 1800 python scripts/probe_gnab.py naive > /tmp/q5_gnab2.log 2>&1
log "probe_gnab naive exit=$? | $(grep 'gn=' /tmp/q5_gnab2.log | tr '\n' ' ')"

timeout 2400 python scripts/probe_attnpack.py > /tmp/q5_attnpack.log 2>&1
log "probe_attnpack exit=$? | $(grep 'ms' /tmp/q5_attnpack.log | tr '\n' ' ' | tail -c 600)"

timeout 3000 python scripts/probe_stage1.py > /tmp/q5_stage1.log 2>&1
log "probe_stage1 exit=$? | $(grep 'ms' /tmp/q5_stage1.log | tr '\n' ' ' | tail -c 600)"

log "queue r5c done"
