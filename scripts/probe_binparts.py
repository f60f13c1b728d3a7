"""Binning-internal attribution at 1024^2/100k (r4: probe_cut showed
binning is ~11.4 ms of the 16.7 ms splat forward — 68%; this cuts INSIDE
bin_instances to find where). K-chained timing per NOTES gotcha 1.

Rows:
  emit      footprint math + q16 keys + pool ownership, NO sort
  sort1     emit + lax.sort keys only
  sort2     emit + lax.sort (keys, gid)            <- the production config
  sort2p    sort2 with pow2 padding (450k -> 512k)
  sort3     emit + lax.sort (keys, em, gid)        <- with_inv=True layout
  bounds    sort2 + searchsorted segment bounds
  full      bin_instances(with_inv=False) as shipped
  rawsort1/2/3  isolated lax.sort on random int32 of the same size
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
from gaussianip_tpu.render.binning import bin_instances
from gaussianip_tpu.render.preprocess import project_gaussians, tile_rect
from gaussianip_tpu.render.render import RenderConfig, _auto_pool

rng = np.random.default_rng(0)
n = 100_000
res = 1024
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

eye = jnp.array([[1.8, 0.0, 0.2]])
c2w = look_at_c2w(eye, jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1]]))
cam = jax.tree.map(lambda x: x[0] if hasattr(x, "ndim") and x.ndim else x,
                   jax.vmap(lambda m: camera_from_c2w(
                       m, jnp.float32(1.0), res, res))(c2w))
cfg = RenderConfig(backend="pallas")
tile = cfg.tile
ntx = nty = -(-res // tile)
nt = ntx * nty
pool = _auto_pool(n, cfg.chunk, res, res, cfg.inline, cfg.tile, cfg.d_max)
e = cfg.inline * n + pool
print(f"e = {e} (inline {cfg.inline} * {n} + pool {pool})", flush=True)
K = 25


def project(st):
    deg = st.active_sh_degree
    off = jnp.zeros((n, 2), jnp.float32)
    return project_gaussians(st.xyz, st.get_scaling(), st.rotation,
                             st.get_opacity()[:, 0], st.get_features(), cam,
                             deg, 1.0, off, None, st.active_mask())


def emit_keys(proj, ownership="scatter", upto="all"):
    """Replicate bin_instances up to (keys, gid), q16/inline=1 path.
    upto="keyin": stop after the inline tier (isolates footprint+key cost);
    upto="nogather": pool tier with the 4-col table gather replaced by a
    row-0 broadcast (isolates the take_along_axis cost)."""
    mean2d, radius, depth, valid = (proj.mean2d, proj.radius_bin, proj.depth,
                                    proj.valid)
    tmin_x, tmin_y, tmax_x, tmax_y = tile_rect(mean2d, radius, tile, ntx, nty)
    side = max(int(cfg.d_max ** 0.5), 1)
    cx = jnp.clip((mean2d[:, 0] / tile).astype(jnp.int32), 0, ntx - 1)
    cy = jnp.clip((mean2d[:, 1] / tile).astype(jnp.int32), 0, nty - 1)
    w0, h0 = tmax_x - tmin_x, tmax_y - tmin_y
    big_x, big_y = w0 > side, h0 > side
    tmin_x = jnp.where(big_x, jnp.clip(cx - side // 2, 0, max(ntx - side, 0)),
                       tmin_x)
    tmax_x = jnp.where(big_x, jnp.minimum(tmin_x + side, ntx), tmax_x)
    tmin_y = jnp.where(big_y, jnp.clip(cy - side // 2, 0, max(nty - side, 0)),
                       tmin_y)
    tmax_y = jnp.where(big_y, jnp.minimum(tmin_y + side, nty), tmax_y)
    w, h = tmax_x - tmin_x, tmax_y - tmin_y
    count = jnp.minimum(jnp.where(valid, w * h, 0), cfg.d_max)

    dmin = jnp.min(jnp.where(valid, depth, jnp.inf))
    dmax = jnp.max(jnp.where(valid, depth, -jnp.inf))
    scale = 65535.0 / jnp.maximum(dmax - dmin, 1e-12)
    rank = jnp.clip(((depth - dmin) * scale).astype(jnp.int32), 0, 65535)

    extra = jnp.maximum(count - 1, 0)
    pool_ofs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(extra)[:-1].astype(jnp.int32)])
    extra_eff = jnp.clip(pool - pool_ofs, 0, extra)
    w_safe = jnp.maximum(w, 1)
    recip_w = 1.0 / w_safe.astype(jnp.float32) * (1.0 + 1e-6)
    sentinel = jnp.int32(nt << 16)

    tile_in = (tmin_y * ntx + tmin_x)
    ok_in = count >= 1
    key_in = jnp.where(ok_in, (tile_in << 16) | rank, sentinel)
    gid_in = jnp.arange(n, dtype=jnp.int32)
    if upto == "keyin":
        return key_in, gid_in, sentinel

    j = jnp.arange(pool, dtype=jnp.int32)
    if ownership == "scatter":
        marks = jnp.zeros((pool,), jnp.int32).at[pool_ofs].add(1,
                                                              mode="drop")
        pool_g = jnp.cumsum(marks) - 1
    elif ownership == "sorted":
        pool_g = jnp.searchsorted(pool_ofs, j, side="right",
                                  method="sort").astype(jnp.int32) - 1
    elif ownership == "none":
        pool_g = j % n  # WRONG result; isolates the ownership cost
    pg = jnp.clip(pool_g, 0, n - 1)
    table = jnp.stack(
        [tmin_x | (tmin_y << 8) | (w_safe << 16), rank, pool_ofs, extra_eff],
        axis=-1)
    if upto == "nogather":
        tp = jnp.broadcast_to(table[:1], (pool, 4))  # WRONG result
    elif upto == "w8":  # row-width experiment: same rows, 2x bytes
        t8 = jnp.concatenate([table, table], axis=1)
        tp = jnp.take_along_axis(t8, pg[:, None], axis=0)[:, :4]
    elif upto == "w2":  # packed 2-word table: same rows, half bytes
        t2 = jnp.stack([table[:, 0] | (table[:, 3] << 24),
                        table[:, 1] | ((table[:, 2] & 0xFFFF) << 16)], -1)
        g2 = jnp.take_along_axis(t2, pg[:, None], axis=0)
        # NOTE pool_ofs truncated to 16 bits -> WRONG result at this n;
        # timing-only row
        tp = jnp.stack([g2[:, 0] & 0xFFFFFF, g2[:, 1] & 0xFFFF,
                        (g2[:, 1] >> 16) & 0xFFFF,
                        ((g2[:, 1] >> 16) & 0xFFFF)
                        + (g2[:, 0] >> 24)], -1)
    else:
        tp = jnp.take_along_axis(table, pg[:, None], axis=0)
    a, rank_p, seg_start, seg_end = (tp[:, 0], tp[:, 1], tp[:, 2],
                                     tp[:, 2] + tp[:, 3])
    ok_pool = (j >= seg_start) & (j < seg_end) & (pool_g >= 0)
    aw = (a >> 16) & 0xFF
    d_pool = jnp.minimum(1 + (j - seg_start), cfg.d_max)
    dy = (d_pool.astype(jnp.float32) * (1.0 / aw.astype(jnp.float32)
                                        * (1.0 + 1e-6))).astype(jnp.int32)
    dx = d_pool - dy * aw
    tile_p = (((a >> 8) & 0xFF) + dy) * ntx + ((a & 0xFF) + dx)
    key_pool = jnp.where(ok_pool, (tile_p << 16) | rank_p, sentinel)

    keys = jnp.concatenate([key_in, key_pool])
    gid = jnp.concatenate([gid_in, pg])
    return keys, gid, sentinel


def make(mode):
    def one(st):
        proj = project(st)
        if mode.startswith("rawsort"):
            # same sizes, synthetic keys tied to the carry via depth
            k = (jax.lax.bitcast_convert_type(
                jnp.pad(proj.depth, (0, e - n), constant_values=1.0),
                jnp.int32) & 0x0FFFFFFF)
            ops = (k,) + tuple(
                jnp.broadcast_to(jnp.arange(e, dtype=jnp.int32), (e,))
                for _ in range(int(mode[-1]) - 1))
            s = jax.lax.sort(ops, num_keys=1, is_stable=False)
            return sum(jnp.sum(x) for x in s).astype(jnp.float32)
        base = mode[1:] if mode.startswith("vemit") else mode
        own = {"emits": "sorted", "emitn": "none",
               "sort2s": "sorted"}.get(base, "scatter")
        upto = {"keyin": "keyin", "nogather": "nogather",
                "emitw8": "w8", "emitw2": "w2"}.get(base, "all")
        if mode.startswith("vemit"):  # vmap(B=1) context, like production
            keys, gid = jax.vmap(
                lambda p: emit_keys(p, ownership=own, upto=upto)[:2]
            )(jax.tree_util.tree_map(lambda x: x[None], proj))
            return (jnp.sum(keys) + jnp.sum(gid)).astype(jnp.float32)
        keys, gid, sentinel = emit_keys(proj, ownership=own, upto=upto)
        if mode in ("emit", "emits", "emitn", "keyin", "nogather",
                    "emitw8", "emitw2"):
            return (jnp.sum(keys) + jnp.sum(gid)).astype(jnp.float32)
        if mode == "sort2s":
            ks, gs = jax.lax.sort((keys, gid), num_keys=1, is_stable=False)
            return (jnp.sum(ks) + jnp.sum(gs)).astype(jnp.float32)
        if mode == "sort1":
            (ks,) = jax.lax.sort((keys,), num_keys=1, is_stable=False)
            return jnp.sum(ks).astype(jnp.float32)
        if mode in ("sort2", "sort2p", "bounds"):
            if mode == "sort2p":
                padn = (1 << (e - 1).bit_length()) - e
                keys = jnp.pad(keys, (0, padn), constant_values=sentinel)
                gid = jnp.pad(gid, (0, padn), constant_values=n)
            ks, gs = jax.lax.sort((keys, gid), num_keys=1, is_stable=False)
            if mode == "bounds":
                tile_sorted = (ks[:e] >> 16).astype(jnp.int32)
                bounds = jnp.searchsorted(
                    tile_sorted, jnp.arange(nt + 1, dtype=jnp.int32),
                    side="left").astype(jnp.int32)
                return (jnp.sum(ks) + jnp.sum(gs)
                        + jnp.sum(bounds)).astype(jnp.float32)
            return (jnp.sum(ks) + jnp.sum(gs)).astype(jnp.float32)
        if mode == "sort3":
            em = jnp.arange(e, dtype=jnp.int32)
            ks, es, gs = jax.lax.sort((keys, em, gid), num_keys=1,
                                      is_stable=False)
            return (jnp.sum(ks) + jnp.sum(es) + jnp.sum(gs)).astype(
                jnp.float32)
        if mode in ("full", "fullo", "vfull", "vfullo"):
            own = "sorted" if mode in ("fullo", "vfullo") else "scatter"

            def call(m, r, z, v):
                return bin_instances(
                    m, r, z, v,
                    tile=tile, n_tiles_x=ntx, n_tiles_y=nty, d_max=cfg.d_max,
                    pool=pool, chunk=cfg.chunk, with_inv=False,
                    inline=cfg.inline, inv_mode=cfg.inv_mode,
                    carry_gid=cfg.carry_gid, depth_key=cfg.depth_key,
                    sort_stable=cfg.sort_stable, ownership=own)

            if mode.startswith("v"):  # production context: vmap over B=1
                b = jax.vmap(call)(proj.mean2d[None], proj.radius_bin[None],
                                   proj.depth[None], proj.valid[None])
            else:
                b = call(proj.mean2d, proj.radius_bin, proj.depth, proj.valid)
            return (jnp.sum(b.gidx) + jnp.sum(b.counts)).astype(jnp.float32)
        raise ValueError(mode)

    @jax.jit
    def f(st):
        carry = jnp.float32(0.0)
        for _ in range(K):
            s2 = st.replace(xyz=st.xyz + carry * 1e-12)
            carry = one(s2)
        return carry

    return f


@jax.jit
def trivial(st):
    return jnp.sum(st.opacity)


def timeit(f, *args, reps=4):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
modes = sys.argv[1:] or ["emit", "emits", "emitn", "sort2", "sort2s",
                         "bounds", "full", "fullo", "rawsort2", "sort3"]
for mode in modes:
    try:
        f = make(mode)
        t_rpc = timeit(trivial, state)
        t = max(timeit(f, state) - t_rpc, 1e-9) / K
        print(f"[{time.time()-t0:.0f}s] {mode:9s} {t*1000:8.2f} ms "
              f"(rpc {t_rpc*1000:.0f})", flush=True)
    except Exception as exc:
        print(f"[{time.time()-t0:.0f}s] {mode:9s} FAILED: "
              f"{str(exc).splitlines()[0][:120]}", flush=True)
