#!/bin/bash
# Round-4 opener: run the queued TPU measurements in priority order.
# (Round 3's axon tunnel outage blocked all of these — see NOTES.md.)
# Each step logs to /tmp/q_<name>.log; progress to /tmp/tpu_queue.log.
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue.log; }

log "queue start"
timeout 150 python -c "import jax; print(jax.devices())" > /tmp/q_sanity.log 2>&1
if [ $? -ne 0 ]; then log "sanity FAILED - tunnel down"; exit 1; fi
log "tunnel OK: $(tail -1 /tmp/q_sanity.log)"

# 1. decides the pack_mode / head_prefetch defaults (both bit-equal gated)
timeout 1800 python scripts/probe_packab.py > /tmp/q_packab.log 2>&1
log "probe_packab exit=$? $(grep -c 'pack=' /tmp/q_packab.log) rows"

# 2. attributes the ~34.7 ms splat fwd+bwd across pipeline stages
timeout 1500 python scripts/probe_cut.py > /tmp/q_cut.log 2>&1
log "probe_cut exit=$? $(grep -c 'upto=' /tmp/q_cut.log) rows"

# 3. attributes the 167 ms UNet+CN denoise glue
for v in full nocn nogn noattn noresize; do
  timeout 900 python scripts/probe_unetglue.py $v > /tmp/q_unet_$v.log 2>&1
  log "unetglue $v exit=$? $(tail -1 /tmp/q_unet_$v.log)"
done
log "queue done — now: flip winning defaults, python bench.py, scripts/bench_pipeline.py"
