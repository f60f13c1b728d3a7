"""Micro-profile: inside binning (sort / relayout) and the backward
(kernel vs gather-VJP scatter-add) at 1024^2 / 100k / d_max=25."""
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

N = 100_000
D_MAX = 25
ICAP = 800_000
NT = 64 * 64
CHUNK = 128
IPAD = ICAP + NT * CHUNK
K = 6

rng = np.random.default_rng(0)
dev = jax.devices()[0]


@jax.jit
def trivial(x):
    return jnp.sum(x)


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


keys = jnp.asarray(rng.integers(0, 2**28, N * D_MAX, dtype=np.int32))
keys = jax.device_put(keys, dev)
t_rpc = timeit(trivial, keys.astype(jnp.float32)[:8])
print(f"rpc_floor_ms={t_rpc*1000:.2f}")


def chain_sort(n_keys):
    ks = keys[:n_keys]

    @jax.jit
    def f(ks):
        s = jnp.int32(0)
        k2 = ks
        for _ in range(K):
            k2 = jax.lax.sort(k2 ^ (s & 1))
            s = k2[0] + k2[-1]
        return s.astype(jnp.float32)

    t = max(timeit(f, ks) - t_rpc, 1e-9) / K
    print(f"sort {n_keys:9d} int32 keys: {t*1000:8.2f} ms "
          f"({t/n_keys*1e9:.0f} ns/key)")
    return t


for nk in [N, 500_000, 1_000_000, N * D_MAX]:
    chain_sort(nk)

# argsort of N floats (the depth rank)
depth = jax.device_put(jnp.asarray(rng.normal(0, 1, N).astype(np.float32)), dev)


@jax.jit
def argsort_chain(d):
    s = jnp.float32(0.0)
    for _ in range(K):
        o = jnp.argsort(d + s * 1e-12, stable=True)
        s = jnp.sum(o[:3].astype(jnp.float32))
    return s


t = max(timeit(argsort_chain, depth) - t_rpc, 1e-9) / K
print(f"argsort {N} f32:          {t*1000:8.2f} ms")

# sort with value payload (key-value) at 500k
kv_vals = jnp.asarray(rng.integers(0, N, 500_000, dtype=np.int32))


@jax.jit
def sortkv_chain(ks, vs):
    s = jnp.int32(0)
    k2, v2 = ks, vs
    for _ in range(K):
        k2, v2 = jax.lax.sort((k2 ^ (s & 1), v2), num_keys=1)
        s = k2[-1] + v2[0]
    return s.astype(jnp.float32)


t = max(timeit(sortkv_chain, keys[:500_000], kv_vals) - t_rpc, 1e-9) / K
print(f"sort 500k (k,v) pairs:    {t*1000:8.2f} ms")

# the relayout scatter: 800k int32 .at[pos].set into [IPAD]
pos = jnp.asarray(rng.permutation(IPAD)[:ICAP].astype(np.int32))
vals = jnp.asarray(rng.integers(0, N, ICAP, dtype=np.int32))
pos, vals = jax.device_put((pos, vals), dev)


@jax.jit
def scatter_chain(pos, vals):
    s = jnp.int32(0)
    for _ in range(K):
        out = jnp.full((IPAD,), N, jnp.int32).at[pos ^ (s & 1)].set(
            vals, mode="drop")
        s = out[0] + out[-1]
    return s.astype(jnp.float32)


t = max(timeit(scatter_chain, pos, vals) - t_rpc, 1e-9) / K
print(f"relayout scatter 800k:    {t*1000:8.2f} ms")

# gather 1.3M x 10 f32 rows (the attribute gather)
packed = jax.device_put(
    jnp.asarray(rng.normal(0, 1, (N, 10)).astype(np.float32)), dev)
gidx = jax.device_put(
    jnp.asarray(rng.integers(0, N, IPAD, dtype=np.int32)), dev)


@jax.jit
def gather_chain(packed, gidx):
    s = jnp.float32(0.0)
    for _ in range(K):
        inst = jnp.take_along_axis(
            packed, (gidx ^ (s.astype(jnp.int32) & 1))[:, None], axis=0)
        s = jnp.sum(inst[::4096])
    return s


t_g = max(timeit(gather_chain, packed, gidx) - t_rpc, 1e-9) / K
print(f"gather 1.3M x10 f32:      {t_g*1000:8.2f} ms")

# scatter-add VJP: 1.3M x10 rows back onto [N,10]
dinst = jax.device_put(
    jnp.asarray(rng.normal(0, 1, (IPAD, 10)).astype(np.float32)), dev)


@jax.jit
def scatteradd_chain(dinst, gidx):
    s = jnp.float32(0.0)
    for _ in range(K):
        out = jnp.zeros((N, 10), jnp.float32).at[
            (gidx ^ (s.astype(jnp.int32) & 1))].add(dinst)
        s = jnp.sum(out[::1024])
    return s


t_s = max(timeit(scatteradd_chain, dinst, gidx) - t_rpc, 1e-9) / K
print(f"scatter-add 1.3M x10:     {t_s*1000:8.2f} ms")

# gather in emission order + reshape-sum (the scatter-free alternative)
inv = jax.device_put(
    jnp.asarray(rng.integers(0, IPAD, N * D_MAX, dtype=np.int32)), dev)


@jax.jit
def gathersum_chain(dinst, inv):
    s = jnp.float32(0.0)
    for _ in range(K):
        em = jnp.take_along_axis(
            dinst, (inv ^ (s.astype(jnp.int32) & 1))[:, None], axis=0)
        out = jnp.sum(em.reshape(N, D_MAX, 10), axis=1)
        s = jnp.sum(out[::1024])
    return s


t_gs = max(timeit(gathersum_chain, dinst, inv) - t_rpc, 1e-9) / K
print(f"gather+reshape-sum 2.5Mx10:{t_gs*1000:7.2f} ms")
