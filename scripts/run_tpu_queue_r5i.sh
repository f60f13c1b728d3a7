#!/bin/bash
# Round-5 queue, part 9: stage-2 attribution (chunk-size sweep at the
# 16384-token attention shapes + per-phase call timing + VAE sweeps).
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }
log "queue r5i start"
timeout 3600 python scripts/probe_refinecut.py > /tmp/q5_refinecut.log 2>&1
log "probe_refinecut exit=$? | $(grep -E 'attn|phase|vae' /tmp/q5_refinecut.log | tr '\n' ' ' | tail -c 900)"
log "queue r5i done"
