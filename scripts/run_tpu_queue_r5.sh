#!/bin/bash
# Round-5 opener: measurement queue in VERDICT r4 priority order.
# 1. span-mode compositor A/B (the purpose-built r4 fix, never measured)
# 2. u16 table-gather / sorted-ownership A/B
# 3. PIPELINE_BENCH refresh at current defaults (3rd ask — hedge vs outage)
# 4. attention layout A/B (head_dim padding waste)
# 5. FastGroupNorm in-context A/B (VAE encode fwd+bwd + UNet denoise)
# Each step logs to /tmp/q5_<name>.log; progress to /tmp/tpu_queue5.log.
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpu_queue5.log; }

log "queue r5 start"
timeout 150 python -c "import jax; print(jax.devices())" > /tmp/q5_sanity.log 2>&1
if [ $? -ne 0 ]; then log "sanity FAILED - tunnel down"; exit 1; fi
log "tunnel OK: $(tail -1 /tmp/q5_sanity.log)"

timeout 1800 python scripts/probe_span.py > /tmp/q5_span.log 2>&1
log "probe_span exit=$? | $(grep 'span=' /tmp/q5_span.log | tr '\n' ' ')"

timeout 1800 python scripts/probe_variants.py > /tmp/q5_variants.log 2>&1
log "probe_variants exit=$? | $(grep 'grad=' /tmp/q5_variants.log | tr '\n' ' ')"

timeout 2700 python scripts/bench_pipeline.py > /tmp/q5_pipeline.log 2>&1
log "bench_pipeline exit=$? | $(tail -1 /tmp/q5_pipeline.log)"

timeout 1500 python scripts/probe_attnpack.py > /tmp/q5_attnpack.log 2>&1
log "probe_attnpack exit=$? | $(grep 'd=' /tmp/q5_attnpack.log | tr '\n' ' ')"

timeout 900 python scripts/probe_vae.py full > /tmp/q5_vae_fast.log 2>&1
log "vae fastgn exit=$? | $(tail -1 /tmp/q5_vae_fast.log)"
GIP_FLAX_GROUPNORM=1 timeout 900 python scripts/probe_vae.py full > /tmp/q5_vae_flax.log 2>&1
log "vae flaxgn exit=$? | $(tail -1 /tmp/q5_vae_flax.log)"

timeout 900 python scripts/probe_unetglue.py full > /tmp/q5_unet_fast.log 2>&1
log "unet fastgn exit=$? | $(tail -1 /tmp/q5_unet_fast.log)"
GIP_FLAX_GROUPNORM=1 timeout 900 python scripts/probe_unetglue.py full > /tmp/q5_unet_flax.log 2>&1
log "unet flaxgn exit=$? | $(tail -1 /tmp/q5_unet_flax.log)"

log "queue r5 done — flip winners, NOTES rows, re-run pipeline if flips land"
