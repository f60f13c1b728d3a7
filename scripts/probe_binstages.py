"""Sub-stage breakdown INSIDE binning at 1024^2/100k (inlined body).

Stages cut after: proj | rects | rank | keys | sort | bounds(=searchsorted)
| inv(scatter) | inv(sort2).
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

from gaussianip_tpu.data.cameras import camera_from_c2w
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.camera_math import look_at_c2w
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig, _auto_pool
from gaussianip_tpu.render.binning import INLINE, _next_pow2
from gaussianip_tpu.render.preprocess import project_gaussians, tile_rect

rng = np.random.default_rng(0)
n = 100_000
res = 1024
batch = 1

z = rng.uniform(-0.85, 0.85, n)
th = rng.uniform(0, 2 * np.pi, n)
r = 0.25 * np.sqrt(np.maximum(0.0, 1 - (z / 0.9) ** 2)) + 0.03
pts = np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)
pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
d2 = mean_dist2_3nn(jnp.asarray(pts), block=4096)
state = create_from_pcd(pts, cols, n, d2)
state = state.replace(
    opacity=jnp.asarray(rng.uniform(-1.0, 2.5, (n, 1)).astype(np.float32)))

az = jnp.linspace(0, 2 * jnp.pi, batch, endpoint=False)
eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                 jnp.full((batch,), 0.2)], -1)
c2w = look_at_c2w(eye, jnp.zeros((batch, 3)),
                  jnp.tile(jnp.array([[0.0, 0, 1]]), (batch, 1)))
cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
cfg = RenderConfig(backend="pallas")

K = 4
tile, chunk, d_max = cfg.tile, cfg.chunk, cfg.d_max
ntx = nty = res // tile
nt = ntx * nty
pool = _auto_pool(n, chunk, res, res)
e = INLINE * n + pool
rank_bits = max(1, (n - 1).bit_length())
sentinel_key = jnp.int32(nt << rank_bits)


def binning_upto(mean2d, radius, depth, valid, upto):
    mean2d = jax.lax.stop_gradient(mean2d)
    depth = jax.lax.stop_gradient(depth)
    tmin_x, tmin_y, tmax_x, tmax_y = tile_rect(mean2d, radius, tile, ntx, nty)
    side = max(int(d_max ** 0.5), 1)
    cx = jnp.clip((mean2d[:, 0] / tile).astype(jnp.int32), 0, ntx - 1)
    cy = jnp.clip((mean2d[:, 1] / tile).astype(jnp.int32), 0, nty - 1)
    w0 = tmax_x - tmin_x
    h0 = tmax_y - tmin_y
    big_x = w0 > side
    big_y = h0 > side
    tmin_x = jnp.where(big_x, jnp.clip(cx - side // 2, 0, max(ntx - side, 0)),
                       tmin_x)
    tmax_x = jnp.where(big_x, jnp.minimum(tmin_x + side, ntx), tmax_x)
    tmin_y = jnp.where(big_y, jnp.clip(cy - side // 2, 0, max(nty - side, 0)),
                       tmin_y)
    tmax_y = jnp.where(big_y, jnp.minimum(tmin_y + side, nty), tmax_y)
    w = tmax_x - tmin_x
    h = tmax_y - tmin_y
    count = jnp.minimum(jnp.where(valid, w * h, 0), d_max)
    if upto == "rects":
        return jnp.sum(count).astype(jnp.float32)

    order = jnp.argsort(jnp.where(valid, depth, jnp.inf), stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    if upto == "rank":
        return jnp.sum(rank[:64]).astype(jnp.float32)

    extra = jnp.maximum(count - INLINE, 0)
    pool_ofs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(extra)[:-1].astype(jnp.int32)])
    extra_eff = jnp.clip(pool - pool_ofs, 0, extra)
    w_safe = jnp.maximum(w, 1)

    def slot_tile(g_tmin_x, g_tmin_y, g_recip_w, g_w, d):
        dy = (d.astype(jnp.float32) * g_recip_w).astype(jnp.int32)
        dx = d - dy * g_w
        return (g_tmin_y + dy) * ntx + (g_tmin_x + dx)

    recip_w = 1.0 / w_safe.astype(jnp.float32) * (1.0 + 1e-6)
    d_in = jnp.arange(INLINE, dtype=jnp.int32)
    tile_in = slot_tile(tmin_x[:, None], tmin_y[:, None], recip_w[:, None],
                        w_safe[:, None], d_in[None, :])
    ok_in = d_in[None, :] < jnp.minimum(count, INLINE)[:, None]
    key_in = jnp.where(ok_in, (tile_in << rank_bits) | rank[:, None],
                       sentinel_key).reshape(-1)

    j = jnp.arange(pool, dtype=jnp.int32)
    seg_start = jnp.zeros((pool,), jnp.int32).at[pool_ofs].max(
        pool_ofs, mode="drop")
    seg_start = jax.lax.cummax(seg_start)
    seg_end = jnp.zeros((pool,), jnp.int32).at[pool_ofs].max(
        pool_ofs + extra_eff, mode="drop")
    seg_end = jax.lax.cummax(seg_end)
    marks = jnp.zeros((pool,), jnp.int32).at[pool_ofs].add(1, mode="drop")
    pool_g = jnp.cumsum(marks) - 1
    ok_pool = (j < seg_end) & (j >= seg_start) & (pool_g >= 0)
    pg = jnp.clip(pool_g, 0, n - 1)
    table = jnp.stack([tmin_x | (tmin_y << 8) | (w_safe << 16), rank], -1)
    tp = jnp.take_along_axis(table, pg[:, None], axis=0)
    a = tp[:, 0]
    rank_p = tp[:, 1]
    aw = (a >> 16) & 0xFF
    d_pool = jnp.minimum(INLINE + (j - seg_start), d_max)
    tile_p = slot_tile(a & 0xFF, (a >> 8) & 0xFF,
                       1.0 / aw.astype(jnp.float32) * (1.0 + 1e-6), aw,
                       d_pool)
    key_pool = jnp.where(ok_pool, (tile_p << rank_bits) | rank_p,
                         sentinel_key)
    keys = jnp.concatenate([key_in, key_pool])
    if upto == "keys":
        return jnp.sum(keys[::997]).astype(jnp.float32)

    vals = jnp.arange(e, dtype=jnp.int32)
    keys_s, em = jax.lax.sort((keys, vals), num_keys=1)
    tile_sorted = (keys_s >> rank_bits).astype(jnp.int32)
    live = keys_s != sentinel_key
    rank_mask = (1 << rank_bits) - 1
    gidx = jnp.where(live, order[keys_s & rank_mask].astype(jnp.int32), n)
    if upto == "sort":
        return (jnp.sum(gidx[:64]).astype(jnp.float32)
                + jnp.sum(tile_sorted[:64]).astype(jnp.float32))

    tile_ids = jnp.arange(nt, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tile_ids,
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tile_ids + 1,
                            side="left").astype(jnp.int32)
    counts = ends - starts
    if upto == "bounds":
        return (jnp.sum(counts).astype(jnp.float32)
                + jnp.sum(gidx[:64]).astype(jnp.float32))

    pos = jnp.arange(e, dtype=jnp.int32)
    pv = jnp.where(live, pos, e)
    if upto == "inv_scatter":
        inv_em = jnp.full((e,), e, jnp.int32).at[em].set(
            pv, unique_indices=True, mode="promise_in_bounds")
    else:
        _, inv_s = jax.lax.sort((em, pv), num_keys=1)
        inv_em = inv_s
    return (jnp.sum(counts).astype(jnp.float32)
            + jnp.sum(inv_em[:64]).astype(jnp.float32))


def chain(upto):
    @jax.jit
    def f(state):
        carry = jnp.float32(0.0)
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            off = jnp.zeros((batch, n, 2))
            proj = jax.vmap(
                lambda cam, o: project_gaussians(
                    st.xyz, st.get_scaling(), st.rotation,
                    st.get_opacity()[:, 0], st.get_features(), cam,
                    st.active_sh_degree, 1.0, o, None,
                    st.active_mask()))(cams, off)
            if upto == "proj":
                carry = jnp.sum(proj.mean2d) + jnp.sum(proj.depth)
            else:
                out = jax.vmap(
                    lambda m, r_, z_, v: binning_upto(m, r_, z_, v, upto)
                )(proj.mean2d, proj.radius_bin, proj.depth, proj.valid)
                carry = jnp.sum(out)
        return carry
    return f


@jax.jit
def trivial(state):
    return jnp.sum(state.opacity)


def timeit(f, *args, reps=4):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
t_rpc = timeit(trivial, state)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)
for upto in ["proj", "rects", "rank", "keys", "sort", "bounds",
             "inv_scatter", "inv_sort"]:
    f = chain(upto)
    t = max(timeit(f, state) - t_rpc, 1e-9) / K
    print(f"[{time.time()-t0:.0f}s] upto {upto:12s} {t*1e3:7.2f} ms",
          flush=True)
