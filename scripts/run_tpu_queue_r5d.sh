#!/bin/bash
# Round-5 queue, part 4 (after the stage-2 score-chunking fix + probe
# rescaling): verify refine fits HBM by compile-only analysis, finish the
# GroupNorm + attention-layout A/Bs, then the full pipeline refresh and a
# fresh splat stage-cut at the u16 defaults.
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }

log "queue r5d start"

timeout 2400 python scripts/probe_refinemem.py > /tmp/q5_refinemem.log 2>&1
log "probe_refinemem exit=$? | $(grep 'GB' /tmp/q5_refinemem.log | tr '\n' ' ' | tail -c 700)"

timeout 1800 python scripts/probe_gnab.py > /tmp/q5_gnab3.log 2>&1
log "probe_gnab exit=$? | $(grep 'gn=' /tmp/q5_gnab3.log | tr '\n' ' ')"

timeout 2400 python scripts/probe_attnpack.py > /tmp/q5_attnpack2.log 2>&1
log "probe_attnpack exit=$? | $(grep -E 'ms$|ms ' /tmp/q5_attnpack2.log | tr '\n' ' ' | tail -c 700)"

timeout 4500 python scripts/bench_pipeline.py > /tmp/q5_pipeline2.log 2>&1
log "bench_pipeline exit=$? | $(tail -1 /tmp/q5_pipeline2.log | tail -c 400)"

timeout 1800 python scripts/probe_cut.py > /tmp/q5_cut.log 2>&1
log "probe_cut exit=$? | $(grep -E 'ms' /tmp/q5_cut.log | tr '\n' ' ' | tail -c 700)"

log "queue r5d done"
