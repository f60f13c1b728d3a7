"""Split the gather-VJP reduction cost: em-gather vs inline reshape-sum vs
pool cumsum; plus binning internals (sort, inv scatter, pool tables)."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianip_tpu.render.binning import INLINE

dev = jax.devices()[0]
B, N, POOL, C = 1, 100_000, 400_000, 10
E = INLINE * N + POOL

rng = np.random.default_rng(0)
dinst = jax.device_put(
    jnp.asarray(rng.normal(0, 1, (B, E, C)).astype(np.float32)), dev)
inv_em = jax.device_put(
    jnp.asarray(rng.permutation(E).astype(np.int32))[None], dev)
pool_ofs = np.sort(rng.integers(0, POOL, N)).astype(np.int32)
pool_len = rng.integers(0, 5, N).astype(np.int32)
pool_ofs_d = jax.device_put(jnp.asarray(pool_ofs)[None], dev)
pool_len_d = jax.device_put(jnp.asarray(pool_len)[None], dev)


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


@jax.jit
def trivial(x):
    return jnp.sum(x[0, 0])


t_rpc = timeit(trivial, dinst)
print(f"rpc={t_rpc*1000:.1f}ms")
K = 6


def chain(f):
    @jax.jit
    def g(x):
        s = jnp.float32(0.0)
        for _ in range(K):
            s = f(x + s * 1e-12)
        return s
    return g


def em_gather(dinst):
    inv_safe = jnp.minimum(inv_em, E - 1)
    dem = jnp.take_along_axis(dinst, inv_safe[..., None], axis=1)
    return jnp.sum(dem[:, ::64])


def inline_sum(dinst):
    return jnp.sum(
        jnp.sum(dinst[:, : INLINE * N].reshape(B, N, INLINE, C), axis=2)
        [:, ::64])


def pool_cumsum(dinst):
    ps = jnp.cumsum(dinst[:, INLINE * N :], axis=1)
    hi = jnp.clip(pool_ofs_d + pool_len_d - 1, 0, POOL - 1)
    seg_hi = jnp.take_along_axis(ps, hi[..., None], axis=1)
    return jnp.sum(seg_hi[:, ::64])


def pool_cumsum_t(dinst):
    # transposed: cumsum along the minor (lane) axis
    d = jnp.swapaxes(dinst[:, INLINE * N :], 1, 2)  # [B, C, POOL]
    ps = jnp.cumsum(d, axis=2)
    hi = jnp.clip(pool_ofs_d + pool_len_d - 1, 0, POOL - 1)
    seg_hi = jnp.take_along_axis(
        ps, jnp.broadcast_to(hi[:, None, :], (B, C, N)), axis=2)
    return jnp.sum(seg_hi[:, :, ::64])


def pool_scatteradd(dinst):
    pg = jnp.zeros((POOL,), jnp.int32)  # fake ids, cost is in the scatter
    out = jnp.zeros((N, C)).at[pg].add(dinst[0, INLINE * N :])
    return jnp.sum(out[::64])


for name, f in [("em_gather 800k", em_gather),
                ("inline reshape-sum", inline_sum),
                ("pool cumsum ax1", pool_cumsum),
                ("pool cumsum minor", pool_cumsum_t),
                ("pool scatter-add", pool_scatteradd)]:
    t = max(timeit(chain(f), dinst) - t_rpc, 1e-9) / K
    print(f"{name:22s} {t*1000:7.2f} ms")

# binning internals
keys = jax.device_put(
    jnp.asarray(rng.integers(0, 2**29, 1 << 20, dtype=np.int32)), dev)
vals = jax.device_put(jnp.arange(1 << 20, dtype=jnp.int32), dev)


def kv_sort(k):
    ks, vs = jax.lax.sort((k, vals), num_keys=1)
    return (ks[::4096].sum() + vs[::4096].sum()).astype(jnp.float32)


def inv_scatter(k):
    em = vals ^ (k[0] & 1)
    out = jnp.full((1 << 20,), 1 << 20, jnp.int32).at[em].set(
        vals, mode="drop")
    return out[::4096].sum().astype(jnp.float32)


t = max(timeit(chain(lambda x: kv_sort(keys ^ (x.astype(jnp.int32) & 1))),
               dinst[0, :1, 0]) - t_rpc, 1e-9) / K
print(f"{'kv sort 1M':22s} {t*1000:7.2f} ms")


@jax.jit
def inv_chain(k):
    s = jnp.int32(0)
    for _ in range(K):
        out = jnp.full((1 << 20,), 1 << 20, jnp.int32).at[vals ^ (s & 1)].set(
            vals, mode="drop")
        s = out[::4096].sum()
    return s.astype(jnp.float32)


t = max(timeit(inv_chain, keys) - t_rpc, 1e-9) / K
print(f"{'inv scatter 1M int32':22s} {t*1000:7.2f} ms")

# scalar gather E from small table (pool_g / own recovery cost)
table = jax.device_put(jnp.asarray(
    rng.integers(0, N, POOL, dtype=np.int32)), dev)
idx = jax.device_put(jnp.asarray(
    rng.integers(0, POOL, E, dtype=np.int32)), dev)


@jax.jit
def sg_chain(idx):
    s = jnp.int32(0)
    for _ in range(K):
        g = table[jnp.minimum(idx ^ (s & 1), POOL - 1)]
        s = g[::4096].sum()
    return s.astype(jnp.float32)


t = max(timeit(sg_chain, idx) - t_rpc, 1e-9) / K
print(f"{'scalar gather 800k':22s} {t*1000:7.2f} ms")
