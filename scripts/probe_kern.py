"""Isolate the Pallas compositor: per-tile fixed cost vs per-chunk cost.

Feeds composite_tiles directly with the bench scene's REAL binned layout,
then with synthetic layouts (empty tiles; aligned starts) to decompose
  total = NT * F_tile + sum(nchunks) * C_chunk
and predict the win from chunk-aligning segment starts.
K-chained timing per NOTES gotcha 1 (perturb data rows via the carry).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianip_tpu.render.composite_pallas import composite_tiles

rng = np.random.default_rng(0)
nt = 4096
chunk = 128
tile = 16
K = 12

# synthetic per-tile counts shaped like the bench scene: ~60% empty tiles,
# covered tiles ~Gamma-distributed around 140
covered = rng.uniform(0, 1, nt) < 0.42
counts = np.where(covered, rng.gamma(3.0, 48.0, nt), 0).astype(np.int32)
mode = sys.argv[1] if len(sys.argv) > 1 else "real"
if mode == "empty":
    counts = np.zeros(nt, np.int32)
elif mode == "one":
    counts = np.minimum(counts, 1)

starts_unal = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
aligned = ((counts + chunk - 1) // chunk) * chunk
starts_al = np.concatenate([[0], np.cumsum(aligned)[:-1]]).astype(np.int32)
e_un = int(counts.sum())
e_al = int(aligned.sum())
epad = ((max(e_un, e_al) + chunk - 1) // chunk + 2) * chunk

def nchunks(starts, counts):
    base = (starts // chunk) * chunk
    return np.where(counts > 0, (starts - base + counts + chunk - 1) // chunk,
                    0).sum()

print(f"mode={mode} live={e_un} unaligned_chunks={nchunks(starts_unal, counts)}"
      f" aligned_chunks={nchunks(starts_al, counts)}", flush=True)

data = jnp.asarray(
    rng.normal(0, 0.1, (1, 16, epad)).astype(np.float32) - 3.0)

def run(starts, label):
    st = jnp.asarray(starts)[None]
    ct = jnp.asarray(counts)[None]

    @jax.jit
    def f(d):
        carry = jnp.float32(0.0)
        for _ in range(K):
            d2 = d + carry * 1e-12
            out = composite_tiles(d2, st, ct, tile, chunk, False, "split2",
                                  False)
            carry = jnp.sum(out[:, :, 0:5])
        return carry

    @jax.jit
    def trivial(d):
        return jnp.sum(d[0, 0, :8])

    def timeit(fn, *a, reps=3):
        float(fn(*a))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(fn(*a))
            ts.append(time.time() - t0)
        return min(ts)

    t_rpc = timeit(trivial, data)
    t = max(timeit(f, data) - t_rpc, 1e-9) / K
    print(f"  {label:12s} {t*1e3:7.2f} ms", flush=True)

run(starts_unal, "unaligned")
run(starts_al, "aligned")
