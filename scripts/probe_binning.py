"""Honest (CSE-proof) breakdown of bin_instances at 1024^2/100k: time
growing prefixes of the binning computation, each chained on perturbed
inputs so nothing hoists out of the loop."""
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
from gaussianip_tpu.render.preprocess import tile_rect

dev = jax.devices()[0]
N = 100_000
TILE, NTX, NTY = 16, 64, 64
NT = NTX * NTY
D_MAX, POOL, CHUNK = 25, 400_000, 128
E = INLINE * N + POOL
RANK_BITS = max(1, (N - 1).bit_length())
SENT = jnp.int32(NT << RANK_BITS)

rng = np.random.default_rng(0)
mean2d = jax.device_put(jnp.asarray(
    rng.uniform(-20, 1044, (N, 2)).astype(np.float32)), dev)
radius = jax.device_put(jnp.asarray(
    np.maximum(rng.lognormal(2.2, 0.8, N), 1).astype(np.int32)), dev)
depth = jax.device_put(jnp.asarray(
    rng.uniform(0.5, 3.0, N).astype(np.float32)), dev)
valid = jax.device_put(jnp.asarray(rng.uniform(0, 1, N) > 0.1), dev)


def stage_rank(mean2d, radius, depth, valid):
    tmin_x, tmin_y, tmax_x, tmax_y = tile_rect(mean2d, radius, TILE, NTX, NTY)
    side = int(D_MAX ** 0.5)
    cx = jnp.clip((mean2d[:, 0] / TILE).astype(jnp.int32), 0, NTX - 1)
    cy = jnp.clip((mean2d[:, 1] / TILE).astype(jnp.int32), 0, NTY - 1)
    w0, h0 = tmax_x - tmin_x, tmax_y - tmin_y
    big_x, big_y = w0 > side, h0 > side
    tmin_x = jnp.where(big_x, jnp.clip(cx - side // 2, 0, NTX - side), tmin_x)
    tmax_x = jnp.where(big_x, jnp.minimum(tmin_x + side, NTX), tmax_x)
    tmin_y = jnp.where(big_y, jnp.clip(cy - side // 2, 0, NTY - side), tmin_y)
    tmax_y = jnp.where(big_y, jnp.minimum(tmin_y + side, NTY), tmax_y)
    w, h = tmax_x - tmin_x, tmax_y - tmin_y
    count = jnp.minimum(jnp.where(valid, w * h, 0), D_MAX)
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf), stable=True)
    rank = jnp.zeros((N,), jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32))
    return tmin_x, tmin_y, w, count, rank


def stage_pool(args):
    tmin_x, tmin_y, w, count, rank = args
    extra = jnp.maximum(count - INLINE, 0)
    pool_ofs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(extra)[:-1].astype(jnp.int32)])
    extra_eff = jnp.clip(POOL - pool_ofs, 0, extra)
    seg_start = jnp.zeros((POOL,), jnp.int32).at[pool_ofs].max(
        pool_ofs, mode="drop")
    seg_start = jax.lax.cummax(seg_start)
    seg_end = jnp.zeros((POOL,), jnp.int32).at[pool_ofs].max(
        pool_ofs + extra_eff, mode="drop")
    seg_end = jax.lax.cummax(seg_end)
    marks = jnp.zeros((POOL,), jnp.int32).at[pool_ofs].add(1, mode="drop")
    pool_g = jnp.cumsum(marks) - 1
    return pool_ofs, extra_eff, seg_start, seg_end, pool_g


def stage_keys(a1, a2):
    tmin_x, tmin_y, w, count, rank = a1
    pool_ofs, extra_eff, seg_start, seg_end, pool_g = a2
    w_safe = jnp.maximum(w, 1)
    d_in = jnp.arange(INLINE, dtype=jnp.int32)
    dy = d_in[None, :] // w_safe[:, None]
    dx = d_in[None, :] % w_safe[:, None]
    tile_in = (tmin_y[:, None] + dy) * NTX + (tmin_x[:, None] + dx)
    ok_in = d_in[None, :] < jnp.minimum(count, INLINE)[:, None]
    key_in = jnp.where(ok_in, (tile_in << RANK_BITS) | rank[:, None],
                       SENT).reshape(-1)
    j = jnp.arange(POOL, dtype=jnp.int32)
    ok_pool = (j < seg_end) & (j >= seg_start) & (pool_g >= 0)
    pg = jnp.clip(pool_g, 0, N - 1)
    table_a = tmin_x | (tmin_y << 8) | (w_safe << 16)
    a = table_a[pg]
    rank_p = rank[pg]
    d_pool = INLINE + (j - seg_start)
    aw = (a >> 16) & 0xFF
    tile_p = ((a >> 8 & 0xFF) + d_pool // aw) * NTX + (a & 0xFF) + d_pool % aw
    key_pool = jnp.where(ok_pool, (tile_p << RANK_BITS) | rank_p, SENT)
    return jnp.concatenate([key_in, key_pool])


def stage_sort(keys):
    vals = jnp.arange(E, dtype=jnp.int32)
    pad = (1 << 20) - E
    keys = jnp.pad(keys, (0, pad), constant_values=SENT)
    vals = jnp.pad(vals, (0, pad), constant_values=E)
    ks, em = jax.lax.sort((keys, vals), num_keys=1)
    return ks[:E], em[:E]


def stage_post(ks, em, pool_g):
    tile_sorted = (ks >> RANK_BITS).astype(jnp.int32)
    live = ks != SENT
    em_c = jnp.minimum(em, E - 1)
    pg = jnp.clip(pool_g, 0, N - 1)
    gidx = jnp.where(
        live, jnp.where(em_c < INLINE * N, em_c // INLINE,
                        pg[jnp.minimum(jnp.maximum(em_c - INLINE * N, 0),
                                       POOL - 1)]), N)
    tids = jnp.arange(NT, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tids + 1, side="left").astype(jnp.int32)
    return gidx, starts, ends - starts, live


def stage_inv(em, live):
    pos = jnp.arange(E, dtype=jnp.int32)
    return jnp.full((E,), E, jnp.int32).at[em].set(
        jnp.where(live, pos, E), mode="drop")


def upto(k):
    def f(mean2d, radius, depth, valid):
        a1 = stage_rank(mean2d, radius, depth, valid)
        out = [a1[3].sum()]
        if k >= 2:
            a2 = stage_pool(a1)
            out.append(a2[0][::512].sum() + a2[4][::512].sum())
        if k >= 3:
            keys = stage_keys(a1, a2)
            out.append(keys[::512].sum())
        if k >= 4:
            ks, em = stage_sort(keys)
            out.append(ks[::512].sum() + em[::512].sum())
        if k >= 5:
            gidx, starts, counts, live = stage_post(ks, em, a2[4])
            out.append(gidx[::512].sum() + starts.sum() + counts.sum())
        if k >= 6:
            inv = stage_inv(em, live)
            out.append(inv[::512].sum())
        return sum(out).astype(jnp.float32)
    return f


def chain(f, K=4):
    @jax.jit
    def g(mean2d, radius, depth, valid):
        s = jnp.float32(0.0)
        for _ in range(K):
            s = f(mean2d + s * 1e-12, radius, depth + s * 1e-12, valid)
        return s
    return g


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
    return jnp.sum(x[:8])


t_rpc = timeit(trivial, depth)
print(f"rpc={t_rpc*1000:.1f}ms")
prev = 0.0
names = ["rect+rank", "+pool alloc", "+key build", "+sort", "+post", "+inv"]
for k in range(1, 7):
    t = max(timeit(chain(upto(k)), mean2d, radius, depth, valid) - t_rpc,
            1e-9) / 4
    print(f"{names[k-1]:12s} cumulative {t*1000:7.2f} ms  "
          f"(+{(t-prev)*1000:6.2f})")
    prev = t
