"""lax.sort cost on v5e vs (size, carried arrays) + binning subparts.

Motivated by probe_r3b.py: proj+bin is 22 ms of the 29 ms fwd at 1024^2/100k.
Questions: (a) how does the instance sort scale with universe size and number
of carried value arrays, (b) what do the depth argsort / rank scatter /
searchsorted cost, (c) is the pow2 pad needed.
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

rng = np.random.default_rng(0)
K = 8


def chain(f, x0s):
    @jax.jit
    def g(*xs):
        carry = jnp.int32(0)
        for _ in range(K):
            ys = f(*[x + carry * 0 for x in xs])
            carry = ys[0].reshape(-1)[0].astype(jnp.int32)
        return carry
    return g


@jax.jit
def trivial(x):
    return jnp.sum(x[:8])


def timeit(f, *args, reps=3):
    jax.block_until_ready(f(*args))
    float(np.asarray(f(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(np.asarray(f(*args)))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
keys_1m = jnp.asarray(rng.integers(0, 1 << 30, 1 << 20).astype(np.int32))
t_rpc = timeit(trivial, keys_1m)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)

for size in [1 << 20, 1 << 19, 650112]:
    keys = keys_1m[:size]
    v1 = jnp.arange(size, dtype=jnp.int32)
    for nvals in [0, 1, 2]:
        arrs = (keys,) + (v1,) * nvals

        def f(*xs):
            return jax.lax.sort(xs, num_keys=1) if len(xs) > 1 else (
                jax.lax.sort(xs[0]),)

        t = max(timeit(chain(f, arrs), *arrs) - t_rpc, 1e-9) / K
        print(f"[{time.time()-t0:.0f}s] sort size={size:8d} vals={nvals}: "
              f"{t*1e3:7.2f} ms", flush=True)

# depth argsort + rank scatter at N=100k
n = 100_000
depth = jnp.asarray(rng.uniform(0.5, 5, n).astype(np.float32))


def rankf(d):
    order = jnp.argsort(d, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return (rank,)


t = max(timeit(chain(rankf, (depth,)), depth) - t_rpc, 1e-9) / K
print(f"[{time.time()-t0:.0f}s] argsort+rankscatter n=100k: {t*1e3:7.2f} ms",
      flush=True)

# searchsorted 650k over 4096 tile ids
tile_sorted = jnp.sort(jnp.asarray(
    rng.integers(0, 4096, 650112).astype(np.int32)))
tid = jnp.arange(4097, dtype=jnp.int32)


def ssf(ts_):
    s = jnp.searchsorted(ts_, tid, side="left").astype(jnp.int32)
    return (s,)


t = max(timeit(chain(ssf, (tile_sorted,)), tile_sorted) - t_rpc, 1e-9) / K
print(f"[{time.time()-t0:.0f}s] searchsorted 650k/4097: {t*1e3:7.2f} ms",
      flush=True)

# scatter-based inverse permutation at 650k (vs the second sort)
em = jnp.asarray(rng.permutation(650112).astype(np.int32))


def invf(em_):
    inv = jnp.zeros((650112,), jnp.int32).at[em_].set(
        jnp.arange(650112, dtype=jnp.int32))
    return (inv,)


t = max(timeit(chain(invf, (em,)), em) - t_rpc, 1e-9) / K
print(f"[{time.time()-t0:.0f}s] scatter-inverse 650k: {t*1e3:7.2f} ms",
      flush=True)
