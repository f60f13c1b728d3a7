"""Isolate the attribute-gather BACKWARD reduction (per-instance grads ->
per-gaussian grads) on the bench scene layout and A/B the formulations:

  scatter   zeros(n,c).at[gidx].add(dinst)           (XLA TPU scatter-add;
            the production vjp_mode="scatter" path)
  emission  gather by inv_em + inline reshape-sum + pool jnp.cumsum
            difference (the vjp_mode="emission" path as written)
  em_mm     emission, but the pool cumsum is a blocked lower-triangular
            MATMUL cumsum (MXU) + tiny block-offset cumsum — XLA's native
            big-array cumsum lowers as a multi-pass scan on TPU

K-chained timing per NOTES gotcha 1 (a carry perturbs dinst each iteration
so XLA cannot CSE/hoist)."""
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
from gaussianip_tpu.render.preprocess import project_gaussians
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
c2w = look_at_c2w(eye, jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1.0]]))
cam = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
cfg = RenderConfig(backend="pallas")
tile, ntx, nty = cfg.tile, res // cfg.tile, res // cfg.tile
pool = _auto_pool(n, cfg.chunk, res, res, cfg.inline, cfg.tile, cfg.d_max)
e = cfg.inline * n + pool

proj = jax.vmap(
    lambda c: project_gaussians(
        state.xyz, state.get_scaling(), state.rotation,
        state.get_opacity()[:, 0], state.get_features(), c,
        state.active_sh_degree, 1.0, jnp.zeros((n, 2)), None,
        state.active_mask()))(cam)
binning = bin_instances(
    proj.mean2d[0], proj.radius_bin[0], proj.depth[0], proj.valid[0],
    proj.radius_cull[0], tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
    d_max=cfg.d_max, pool=pool, chunk=cfg.chunk, with_inv=True,
    inline=cfg.inline, inv_mode=cfg.inv_mode, carry_gid=cfg.carry_gid,
    depth_key=cfg.depth_key, sort_stable=cfg.sort_stable,
    ownership=cfg.ownership, tile_cull=cfg.tile_cull)
gidx = jax.device_get(binning.gidx)
print(f"e={e} live={int((gidx < n).sum())} pool={pool}", file=sys.stderr)

C = 10
dinst0 = jnp.asarray(rng.normal(0, 1, (e, C)).astype(np.float32))
gidx_d = binning.gidx
inv_em = binning.inv_em
pool_ofs = binning.pool_ofs
pool_len = binning.pool_len
inline = cfg.inline
live = (gidx_d < n)


def red_scatter(dinst):
    d = jnp.where(live[:, None], dinst, 0.0)
    return jnp.zeros((n, C), jnp.float32).at[
        jnp.minimum(gidx_d, n - 1)].add(d)


def _em_gather(dinst):
    inv_safe = jnp.minimum(inv_em, e - 1)
    dem = jnp.take_along_axis(dinst, inv_safe[:, None], axis=0)
    return jnp.where((inv_em < e)[:, None], dem, 0.0)


def _seg_diff(ps):
    hi = jnp.clip(pool_ofs + pool_len - 1, 0, pool - 1)
    lo = pool_ofs - 1
    seg_hi = jnp.take_along_axis(ps, hi[:, None], axis=0)
    seg_lo = jnp.where(
        (lo >= 0)[:, None],
        jnp.take_along_axis(ps, jnp.maximum(lo, 0)[:, None], axis=0), 0.0)
    return jnp.where((pool_len > 0)[:, None], seg_hi - seg_lo, 0.0)


def red_emission(dinst):
    dem = _em_gather(dinst)
    dpacked = jnp.sum(dem[: inline * n].reshape(n, inline, C), axis=1)
    ps = jnp.cumsum(dem[inline * n:], axis=0)
    return dpacked + _seg_diff(ps)


def mm_cumsum(x, blk=256):
    p, c = x.shape
    pp = -(-p // blk) * blk
    xb = jnp.pad(x, ((0, pp - p), (0, 0))).reshape(pp // blk, blk, c)
    tri = jnp.tril(jnp.ones((blk, blk), jnp.float32))
    within = jax.lax.dot_general(
        tri, xb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [blk, nb, c]
    within = jnp.swapaxes(within, 0, 1)  # [nb, blk, c]
    tot = within[:, -1, :]
    offs = jnp.cumsum(tot, axis=0) - tot
    return (within + offs[:, None, :]).reshape(pp, c)[:p]


def red_em_mm(dinst):
    dem = _em_gather(dinst)
    dpacked = jnp.sum(dem[: inline * n].reshape(n, inline, C), axis=1)
    ps = mm_cumsum(dem[inline * n:])
    return dpacked + _seg_diff(ps)


# correctness vs float64 numpy scatter reference
dinst_np = np.asarray(jax.device_get(dinst0), np.float64)
ref = np.zeros((n, C), np.float64)
liven = gidx < n
np.add.at(ref, gidx[liven], dinst_np[liven])
for name, f in [("scatter", red_scatter), ("emission", red_emission),
                ("em_mm", red_em_mm)]:
    got = np.asarray(jax.device_get(jax.jit(f)(dinst0)), np.float64)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    print(f"{name:10s} rel_err {err:.2e}", file=sys.stderr)

K = 25
t0 = time.time()


def mark(s):
    print(f"[{time.time()-t0:5.0f}s] {s}", file=sys.stderr, flush=True)


def timeit(f, reps=3):
    @jax.jit
    def chain(dinst):
        carry = jnp.float32(0.0)
        for _ in range(K):
            out = f(dinst + carry * 1e-12)
            carry = jnp.sum(out)
        return carry

    float(chain(dinst0))
    ts = []
    for _ in range(reps):
        s = time.time()
        float(chain(dinst0))
        ts.append(time.time() - s)
    return min(ts) / K * 1000


@jax.jit
def trivial(x):
    return jnp.sum(x[0])


float(trivial(dinst0))
s = time.time()
float(trivial(dinst0))
rpc = (time.time() - s) * 1000

which = sys.argv[1:] or ["scatter", "emission", "em_mm", "cumsum"]
for name, f in [("scatter", red_scatter), ("emission", red_emission),
                ("em_mm", red_em_mm)]:
    if name in which:
        mark(f"{name:10s} {timeit(f) - rpc / K:7.2f} ms")
if "cumsum" in which:
    xp = dinst0[inline * n:]
    mark(f"{'cumsum_xla':10s} {timeit(lambda x: jnp.cumsum(x[inline*n:], axis=0)) - rpc/K:7.2f} ms")
    mark(f"{'cumsum_mm':10s} {timeit(lambda x: mm_cumsum(x[inline*n:])) - rpc/K:7.2f} ms")

# ---- sub-part attribution + gather variants (run with arg "parts") ----
if "parts" in which:
    inv_safe = jnp.minimum(inv_em, e - 1)

    def g_row(x):
        return jnp.take_along_axis(x, inv_safe[:, None], axis=0)

    def g_cols(x):
        return jnp.stack([x[:, i][inv_safe] for i in range(C)], axis=-1)

    def g_row16(x):
        xp = jnp.pad(x, ((0, 0), (0, 6)))
        return jnp.take_along_axis(xp, inv_safe[:, None], axis=0)

    def g_bf16(x):
        return jnp.take_along_axis(x.astype(jnp.bfloat16),
                                   inv_safe[:, None], axis=0)

    def seg_only(x):
        return _seg_diff(x[:pool])

    def inline_only(x):
        return jnp.sum(x[: inline * n].reshape(n, inline, C), axis=1)

    for nm, f in [("g_row", g_row), ("g_cols", g_cols), ("g_row16", g_row16),
                  ("g_bf16", g_bf16), ("seg_diff", seg_only),
                  ("inline_sum", inline_only)]:
        mark(f"{nm:10s} {timeit(f) - rpc / K:7.2f} ms")

# ---- exact bitcast-gather + scatter-set variants (arg "bitcast") ----
if "bitcast" in which:
    inv_safe = jnp.minimum(inv_em, e - 1)
    em = jnp.zeros((e,), jnp.int32).at[inv_safe].set(
        jnp.arange(e, dtype=jnp.int32), mode="drop")  # rebuild em for probe

    def g_bitcast(x):
        # exact: reinterpret f32 rows as 2x-wide bf16 rows, gather, restore
        xb = jax.lax.bitcast_convert_type(x, jnp.bfloat16).reshape(e, 2 * C)
        g = jnp.take_along_axis(xb, inv_safe[:, None], axis=0)
        return jax.lax.bitcast_convert_type(
            g.reshape(e, C, 2), jnp.float32)

    def g_set_em(x):
        # emission order via unique-index scatter-SET at em (no inv_em)
        return jnp.zeros((e, C), jnp.float32).at[em].set(
            x, unique_indices=True, mode="promise_in_bounds")

    def g_set_em_bc(x):
        xb = jax.lax.bitcast_convert_type(x, jnp.bfloat16).reshape(e, 2 * C)
        o = jnp.zeros((e, 2 * C), jnp.bfloat16).at[em].set(
            xb, unique_indices=True, mode="promise_in_bounds")
        return jax.lax.bitcast_convert_type(
            o.reshape(e, C, 2), jnp.float32)

    def sc_add_bc(x):
        # scatter-ADD cannot ride the bitcast (adds must be in f32) — this
        # is the bf16-accumulate variant, approximate, for speed reference
        d = jnp.where(live[:, None], x, 0.0).astype(jnp.bfloat16)
        return jnp.zeros((n, C), jnp.bfloat16).at[
            jnp.minimum(gidx_d, n - 1)].add(d)

    x64 = np.asarray(jax.device_get(dinst0), np.float64)
    got = np.asarray(jax.device_get(jax.jit(g_bitcast)(dinst0)))
    ref_g = x64[np.asarray(jax.device_get(inv_safe))]
    print("g_bitcast exact:", np.array_equal(got.astype(np.float64), ref_g),
          file=sys.stderr)
    for nm, f in [("g_bitcast", g_bitcast), ("g_set_em", g_set_em),
                  ("g_set_em_bc", g_set_em_bc), ("sc_add_bc", sc_add_bc)]:
        mark(f"{nm:12s} {timeit(f) - rpc / K:7.2f} ms")

# ---- u16 bitcast (integer: no NaN canonicalization) + inv cost ----
if "u16" in which:
    inv_safe = jnp.minimum(inv_em, e - 1)

    def g_bitcast_u16(x):
        xb = jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(e, 2 * C)
        g = jnp.take_along_axis(xb, inv_safe[:, None], axis=0)
        return jax.lax.bitcast_convert_type(g.reshape(e, C, 2), jnp.float32)

    got = np.asarray(jax.device_get(jax.jit(g_bitcast_u16)(dinst0)))
    ref_g = np.asarray(jax.device_get(dinst0))[
        np.asarray(jax.device_get(inv_safe))]
    print("g_bitcast_u16 exact:", np.array_equal(got, ref_g),
          file=sys.stderr)
    mark(f"{'g_bc_u16':12s} {timeit(g_bitcast_u16) - rpc / K:7.2f} ms")

    def seg_u16(x):
        ps = x[:pool]
        psb = jax.lax.bitcast_convert_type(ps, jnp.uint16).reshape(
            pool, 2 * C)
        hi = jnp.clip(pool_ofs + pool_len - 1, 0, pool - 1)
        lo = pool_ofs - 1
        sh = jnp.take_along_axis(psb, hi[:, None], axis=0)
        sl = jnp.take_along_axis(psb, jnp.maximum(lo, 0)[:, None], axis=0)
        shf = jax.lax.bitcast_convert_type(sh.reshape(n, C, 2), jnp.float32)
        slf = jax.lax.bitcast_convert_type(sl.reshape(n, C, 2), jnp.float32)
        slf = jnp.where((lo >= 0)[:, None], slf, 0.0)
        return jnp.where((pool_len > 0)[:, None], shf - slf, 0.0)

    mark(f"{'seg_u16':12s} {timeit(seg_u16) - rpc / K:7.2f} ms")

if "invcost" in which:
    import functools
    common = dict(tile=tile, n_tiles_x=ntx, n_tiles_y=nty, d_max=cfg.d_max,
                  pool=pool, chunk=cfg.chunk, inline=cfg.inline,
                  inv_mode="scatter", carry_gid=cfg.carry_gid,
                  depth_key=cfg.depth_key, sort_stable=cfg.sort_stable,
                  ownership=cfg.ownership, tile_cull=cfg.tile_cull)

    def bin_k(wi):
        @jax.jit
        def chain(m2d):
            carry = jnp.float32(0.0)
            for _ in range(K):
                b = bin_instances(
                    m2d + carry * 1e-12, proj.radius_bin[0], proj.depth[0],
                    proj.valid[0], proj.radius_cull[0], with_inv=wi,
                    **common)
                carry = jnp.sum(b.counts).astype(jnp.float32) * 1e-12 + \
                    jnp.sum(b.inv_em[:1]).astype(jnp.float32) * 1e-12
            return carry
        return chain

    for wi in (False, True):
        f = bin_k(wi)
        float(f(proj.mean2d[0]))
        ts = []
        for _ in range(3):
            s = time.time()
            float(f(proj.mean2d[0]))
            ts.append(time.time() - s)
        mark(f"bin with_inv={int(wi)} {min(ts)/K*1000 - rpc/K:7.2f} ms")

# ---- u16-bitcast variants of the index scatters/gathers ("u16b") ----
if "u16b" in which:
    pos = jnp.arange(e, dtype=jnp.int32)
    em0 = jnp.zeros((e,), jnp.int32).at[jnp.minimum(inv_em, e - 1)].set(
        pos, mode="drop")

    def inv_i32(em):
        return jnp.full((e,), e, jnp.int32).at[em].set(
            pos, unique_indices=True, mode="promise_in_bounds")

    def inv_u16(em):
        pv = jax.lax.bitcast_convert_type(pos, jnp.uint16)  # [e, 2]
        o = jnp.zeros((e, 2), jnp.uint16).at[em].set(
            pv, unique_indices=True, mode="promise_in_bounds")
        return jax.lax.bitcast_convert_type(o, jnp.int32)

    a = np.asarray(jax.device_get(jax.jit(inv_i32)(em0)))
    b = np.asarray(jax.device_get(jax.jit(inv_u16)(em0)))
    lv = np.asarray(jax.device_get(em0)) < e
    print("inv_u16 matches:", np.array_equal(a[lv], b[lv]), file=sys.stderr)

    def chain_int(f):
        @jax.jit
        def c(em):
            carry = jnp.int32(0)
            for _ in range(K):
                out = f(jnp.minimum(em + carry * 0, e - 1))
                carry = out[0] - out[0] + jnp.max(out) * 0
            return carry
        return c

    for nm, f in [("inv_i32", inv_i32), ("inv_u16", inv_u16)]:
        cf = chain_int(f)
        int(cf(em0))
        ts = []
        for _ in range(3):
            s = time.time()
            int(cf(em0))
            ts.append(time.time() - s)
        mark(f"{nm:12s} {min(ts)/K*1000 - rpc/K:7.2f} ms")

    # forward attribute gather: f32 [n,10] table -> [e,10] rows
    tab = dinst0[:n]
    gsafe = jnp.minimum(gidx_d, n - 1)

    def fg_f32(t):
        return jnp.take_along_axis(t, gsafe[:, None], axis=0)

    def fg_u16(t):
        tb = jax.lax.bitcast_convert_type(t, jnp.uint16).reshape(n, 2 * C)
        g = jnp.take_along_axis(tb, gsafe[:, None], axis=0)
        return jax.lax.bitcast_convert_type(g.reshape(e, C, 2), jnp.float32)

    def chain_t(f):
        @jax.jit
        def c(t):
            carry = jnp.float32(0.0)
            for _ in range(K):
                out = f(t + carry * 1e-12)
                carry = jnp.sum(out)
            return carry
        return c

    for nm, f in [("fgath_f32", fg_f32), ("fgath_u16", fg_u16)]:
        cf = chain_t(f)
        float(cf(tab))
        ts = []
        for _ in range(3):
            s = time.time()
            float(cf(tab))
            ts.append(time.time() - s)
        mark(f"{nm:12s} {min(ts)/K*1000 - rpc/K:7.2f} ms")

    # binning pool-table gather: int32 [n,3] -> [pool,3]
    tab3 = jnp.stack([pos[:n], pos[:n] * 2, pos[:n] * 3], -1)
    pg = jnp.clip(jnp.cumsum(jnp.zeros((pool,), jnp.int32)), 0, n - 1)
    pg = jnp.asarray(rng.integers(0, n, pool, dtype=np.int32))
    pg = jnp.sort(pg)  # monotone like the real ownership

    def tg_i32(t):
        return jnp.take_along_axis(t, pg[:, None], axis=0)

    def tg_u16(t):
        tb = jax.lax.bitcast_convert_type(t, jnp.uint16).reshape(n, 6)
        g = jnp.take_along_axis(tb, pg[:, None], axis=0)
        return jax.lax.bitcast_convert_type(g.reshape(pool, 3, 2), jnp.int32)

    def chain_i(f):
        @jax.jit
        def c(t):
            carry = jnp.int32(0)
            for _ in range(K):
                out = f(t + carry * 0)
                carry = jnp.max(out) * 0
            return carry
        return c

    for nm, f in [("tgath_i32", tg_i32), ("tgath_u16", tg_u16)]:
        cf = chain_i(f)
        int(cf(tab3))
        ts = []
        for _ in range(3):
            s = time.time()
            int(cf(tab3))
            ts.append(time.time() - s)
        mark(f"{nm:12s} {min(ts)/K*1000 - rpc/K:7.2f} ms")
