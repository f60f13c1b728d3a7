#!/bin/bash
# Pre-warm the persistent compile cache (.jax_cache) for the driver's
# budgeted bench run. Run AFTER the last kernel-touching commit of a round:
# bench.py compiles exactly the graphs the driver will need (unet denoise,
# splat fwd / fwd+bwd @1024^2, train-step render @512^2 b4), and a cold
# compile through the axon tunnel takes 1-4 min per graph — more than the
# driver's slice (r2 and r4 both lost tracked metrics to this).
cd "$(dirname "$0")/.."
echo "[warm] bench.py with a wide budget (cold compiles allowed here)"
BENCH_BUDGET_S=1500 timeout 1900 python bench.py > /tmp/warm_bench.log 2>&1
echo "[warm] exit=$? last: $(tail -c 400 /tmp/warm_bench.log)"
