"""Tile binning: gaussians -> depth-ordered per-tile instance segments.

TPU-native replacement for the CUDA duplicate+radix-sort binning inside
diff-gaussian-rasterization (consumed at reference:
gaussiansplatting/gaussian_renderer/__init__.py:85-93). Design (v2):

  * two-tier duplication keeps the sort small: every gaussian gets
    `inline` instance slots (default 1); footprints beyond that draw
    contiguous slots from a shared overflow POOL sized by resolution (pool
    exhaustion is counted in n_dropped, and footprints are first clamped to
    a centered d_max-tile window like v1). The sort universe is
    inline*N + pool instead of N * d_max (~6x fewer keys at 1024^2);
  * ONE stable key+value sort: key = tile_id << rank_bits | depth_rank
    (rank from one cheap N argsort), value = emission index. Instances land
    grouped by tile, depth-ordered within the tile, invalid slots sink to
    the tail — compaction falls out of the sort;
  * segments stay UNALIGNED (no chunk re-layout scatter): the Pallas
    compositor reads lane-aligned supersets of each segment and masks the
    head rows (composite_pallas.py);
  * when carry_gid=False the sorted emission values recover the gaussian id
    per instance with one small post-sort gather (trades a sort payload for
    a gather; carry_gid=True rides the 2-operand XLA kv-sort fast path).

Everything here is integer index work and runs under stop_gradient; the
differentiable attribute gather (and its scatter-add VJP — a hand-built
emission-order reduction measured ~4 ms slower end-to-end was deleted in
r5, scripts/probe_vjpcut data in NOTES.md) happens in render.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import tile_rect

INLINE = 1  # default inline instance slots per gaussian (tier 1); the
#             sort/gather/reduction universe is inline*N + pool, and 1
#             measured fastest at 1024^2/100k (scripts/probe_inline.py)


class Binning(NamedTuple):
    gidx: jnp.ndarray  # [E] gaussian index per sorted instance (N = dead)
    tile_of: jnp.ndarray  # [E] tile id per sorted instance (NT = dead)
    starts: jnp.ndarray  # [NT] segment starts (UNALIGNED)
    counts: jnp.ndarray  # [NT] live instance counts per tile
    n_dropped: jnp.ndarray  # int32: instances lost to pool overflow


@functools.partial(
    jax.jit,
    static_argnames=("tile", "n_tiles_x", "n_tiles_y", "d_max", "pool",
                     "chunk", "carry_gid", "inline", "depth_key",
                     "sort_stable", "tile_cull", "table_gather"),
)
def bin_instances(
    mean2d,
    radius,
    depth,
    valid,
    radius_cull=None,
    *,
    tile: int,
    n_tiles_x: int,
    n_tiles_y: int,
    d_max: int,
    pool: int,
    chunk: int,
    carry_gid: bool = True,
    inline: int = INLINE,
    depth_key: str = "rank",
    sort_stable: bool = True,
    tile_cull: bool = True,
    table_gather: str = "i32",
):
    """depth_key selects how within-tile depth order enters the sort:

      * "rank": key = tile << rank_bits | depth_rank, where ranks come from
        one stable N argsort (the original scheme);
      * "exact2": TWO-key lexicographic sort (tile_id, depth_bits) — the
        IEEE-754 bit pattern of a positive f32 (preprocess culls depth<=near
        so all valid depths are positive) is order-isomorphic to its value,
        so sorting the bitcast depths is exact. Skips the N argsort + rank
        scatter entirely (requires carry_gid). Ordering matches "rank"
        everywhere except EXACT f32 depth ties, where the stable sort falls
        back to emission order (inline tier before pool tier) instead of
        gaussian-index order — compositing-equivalent, and bit-identical
        whenever per-tile depths are distinct;
      * "q16": single key tile << 16 | q16(depth) with depth affinely
        quantized to 16 bits — cheapest keys, approximate within-tile order
        for depths closer than range/65536 (requires carry_gid).

    sort_stable=False lets XLA drop the stability guarantee on the main
    instance sort. Live keys are UNIQUE under "rank"/"exact2" (one instance
    per gaussian per tile; ranks/depth-bits are per-gaussian), so the result
    is unchanged wherever it matters — only the internal order of dead
    (sentinel) slots and of exact-depth ties (exact2) / same-bucket ties
    (q16) may vary, all compositing-equivalent.

    tile_cull=True additionally drops (gaussian, tile) instances whose
    circle of `radius_cull` around mean2d misses the tile's pixel rect — a
    refinement of the CUDA bbox test that is output-preserving up to
    T_EPS-scale early-stop reassociation (removing zero-alpha instances
    shifts chunk boundaries, reassociating the triangular-matmul partial
    sums for instances sitting exactly on the T>=1e-4 early-stop threshold;
    observed up to ~2e-4 on depth — see test_tile_cull_output_preserving)
    when radius_cull is preprocess.py's UNCAPPED alpha>=1/255 radius:
    q(p) >= |p - mean|^2 / lam_max(cov) means every pixel of a culled tile
    has alpha below the 1/255 gate the compositor applies anyway. Corner
    tiles of the bounding box are the usual casualty (box vs circle: up to
    ~21% of emitted instances at large footprints).
    NOTE radius_cull must be >= the alpha threshold radius; the bbox radius
    (3-sigma-capped) is only a valid stand-in when opacity <= ~0.32 — so
    when radius_cull is None (no alpha-threshold radius supplied) circle
    culling is DISABLED rather than silently run lossy against `radius`.
    """
    n = mean2d.shape[0]
    nt = n_tiles_x * n_tiles_y
    e = inline * n + pool
    assert depth_key in ("rank", "exact2", "q16"), depth_key
    # carry_gid=False always sorts the em payload (need_em below) and
    # recovers gid = gid_all[em] post-sort — valid under every depth_key
    rank_bits = (16 if depth_key == "q16"
                 else max(1, (n - 1).bit_length()))
    assert depth_key == "exact2" or (nt + 1) < (1 << (31 - rank_bits)), \
        "tile/rank bits exceed int32"
    assert pool % chunk == 0, "pool must be a multiple of chunk"
    # the packed per-gaussian table stores tmin_x, tmin_y and w in 8-bit
    # fields (tmin_x | tmin_y << 8 | w << 16, extracted with & 0xFF below);
    # >255 tiles per axis (>4080 px at tile=16) would silently corrupt
    # pool-tier tile ids — fail loudly instead
    assert n_tiles_x <= 255 and n_tiles_y <= 255, (
        f"{n_tiles_x}x{n_tiles_y} tiles exceed the 8-bit packed-table "
        f"fields (max 255 per axis; render in crops beyond ~4080 px)")
    two_key = depth_key == "exact2"
    sentinel_key = jnp.int32(nt if two_key else (nt << rank_bits))
    if radius_cull is None:
        # no alpha-threshold radius supplied: circle culling against the
        # 3-sigma-capped bbox radius would be lossy (docstring NOTE), so
        # fall back to the exact bbox-only path
        tile_cull = False
        radius_cull = radius

    mean2d = jax.lax.stop_gradient(mean2d)
    depth = jax.lax.stop_gradient(depth)

    tmin_x, tmin_y, tmax_x, tmax_y = tile_rect(
        mean2d, radius, tile, n_tiles_x, n_tiles_y
    )
    # footprints larger than the D_MAX budget are clamped to a CENTERED
    # side x side tile window around the mean (symmetric truncation: the
    # gaussian's core renders, only far tails are cut)
    side = max(int(d_max ** 0.5), 1)
    cx = jnp.clip((mean2d[:, 0] / tile).astype(jnp.int32), 0, n_tiles_x - 1)
    cy = jnp.clip((mean2d[:, 1] / tile).astype(jnp.int32), 0, n_tiles_y - 1)
    w0 = tmax_x - tmin_x
    h0 = tmax_y - tmin_y
    big_x = w0 > side
    big_y = h0 > side
    tmin_x = jnp.where(
        big_x, jnp.clip(cx - side // 2, 0, max(n_tiles_x - side, 0)), tmin_x)
    tmax_x = jnp.where(big_x, jnp.minimum(tmin_x + side, n_tiles_x), tmax_x)
    tmin_y = jnp.where(
        big_y, jnp.clip(cy - side // 2, 0, max(n_tiles_y - side, 0)), tmin_y)
    tmax_y = jnp.where(big_y, jnp.minimum(tmin_y + side, n_tiles_y), tmax_y)
    w = tmax_x - tmin_x
    h = tmax_y - tmin_y
    count = jnp.where(valid, w * h, 0)
    count = jnp.minimum(count, d_max)

    # per-gaussian depth-order carrier; meaning depends on depth_key:
    # exact global rank (one stable N argsort), 16-bit affine quantization,
    # or the raw f32 bit pattern (two-key mode sorts it as a second key)
    if depth_key == "rank":
        # global depth ranks (stable; invalid sink to the end)
        order = jnp.argsort(jnp.where(valid, depth, jnp.inf), stable=True)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
    elif depth_key == "q16":
        dmin = jnp.min(jnp.where(valid, depth, jnp.inf))
        dmax = jnp.max(jnp.where(valid, depth, -jnp.inf))
        scale = 65535.0 / jnp.maximum(dmax - dmin, 1e-12)
        rank = jnp.clip(((depth - dmin) * scale).astype(jnp.int32), 0, 65535)
    else:  # exact2: order-isomorphic bits of the (positive) f32 depth
        rank = jax.lax.bitcast_convert_type(
            depth.astype(jnp.float32), jnp.int32)

    # pool allocation: gaussian g draws extra_eff contiguous slots at
    # pool_ofs (exclusive cumsum); exhausted pool truncates (counted)
    extra = jnp.maximum(count - inline, 0)
    pool_ofs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(extra)[:-1].astype(jnp.int32)])
    extra_eff = jnp.clip(pool - pool_ofs, 0, extra)
    n_dropped = jnp.sum(extra - extra_eff).astype(jnp.int32)
    count_eff = jnp.minimum(count, inline) + extra_eff

    w_safe = jnp.maximum(w, 1)

    def slot_txy(g_tmin_x, g_tmin_y, g_recip_w, g_w, d):
        # d // w and d % w through f32 reciprocals: the VPU has no integer
        # divide, and vector-divisor int division expands to a slow loop.
        # Exact for d < 2^12, w < 2^8 (quotient error << 1/w)
        dy = (d.astype(jnp.float32) * g_recip_w).astype(jnp.int32)
        dx = d - dy * g_w
        return g_tmin_x + dx, g_tmin_y + dy

    def circle_ok(tx, ty, mx, my, r2):
        # circle(mean2d, radius) vs tile pixel-rect [t*tile, t*tile+tile-1]
        lo_x = (tx * tile).astype(jnp.float32)
        lo_y = (ty * tile).astype(jnp.float32)
        ddx = mx - jnp.clip(mx, lo_x, lo_x + (tile - 1))
        ddy = my - jnp.clip(my, lo_y, lo_y + (tile - 1))
        return ddx * ddx + ddy * ddy <= r2

    recip_w = 1.0 / w_safe.astype(jnp.float32) * (1.0 + 1e-6)

    # tier 1: inline slots, [N, INLINE] broadcast (no gathers)
    d_in = jnp.arange(inline, dtype=jnp.int32)
    tx_in, ty_in = slot_txy(tmin_x[:, None], tmin_y[:, None],
                            recip_w[:, None], w_safe[:, None], d_in[None, :])
    tile_in = ty_in * n_tiles_x + tx_in
    ok_in = d_in[None, :] < jnp.minimum(count, inline)[:, None]
    if tile_cull:
        rad_f = radius_cull.astype(jnp.float32)
        ok_in = ok_in & circle_ok(tx_in, ty_in, mean2d[:, 0:1],
                                  mean2d[:, 1:2], (rad_f * rad_f)[:, None])
    if two_key:
        key_in = jnp.where(ok_in, tile_in, sentinel_key).reshape(-1)
        sub_in = jnp.broadcast_to(rank[:, None], (n, inline)).reshape(-1)
    else:
        key_in = jnp.where(
            ok_in, (tile_in << rank_bits) | rank[:, None], sentinel_key
        ).reshape(-1)
    gid_in = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, inline)).reshape(-1)

    # tier 2: pool slots. Owning gaussian via mark-scatter + cumsum; its
    # segment bounds ride the SAME per-gaussian row gather as the geometry
    # (one 4-col gather replaces the two pool-wide cummax scans an earlier
    # version used for seg_start/seg_end).
    j = jnp.arange(pool, dtype=jnp.int32)
    # unclipped offsets: gaussians whose segment starts beyond the pool drop
    # out entirely (scatter mode="drop") instead of corrupting the last
    # slot. pool_g[j] = (#i: pool_ofs[i] <= j) - 1 via mark-scatter +
    # cumsum (0.88 ms; searchsorted method='sort' measured +2.5 ms WORSE
    # and a whole-render ownership="sorted" variant 28.07 vs 23.74 ms —
    # r4 probe_binparts / r5 probe_variants, deleted).
    marks = jnp.zeros((pool,), jnp.int32).at[pool_ofs].add(1, mode="drop")
    pool_g = jnp.cumsum(marks) - 1  # [pool] owning gaussian (stale for
    #                                 dead slots; ok_pool masks those)
    pg = jnp.clip(pool_g, 0, n - 1)
    # packed per-gaussian table -> ONE row gather. TPU gathers cost roughly
    # per ELEMENT (r4 probe_binparts: the old 4-col gather was ~2.2 ms of
    # the 1024^2 binning), so everything is squeezed into 3 int32 columns:
    #   col0: tmin_x | tmin_y<<8 | w<<16 | rad8<<24  (rad8 = cull radius
    #         capped at 255; 255 disables the cull for that gaussian —
    #         conservative: skipping a cull never drops a contribution)
    #   col1: rank | fx8<<16 | fy8<<24  (q16 depth carrier is 16 bits; the
    #         mean2d position rides the top 16 as 2-px-quantized offsets
    #         from the tmin corner — cull slack +1.5 px absorbs the
    #         quantization, again conservative)
    #   col2: pool_ofs (segment start). Segments TILE the pool exactly
    #         (pool_ofs is the cumsum of extra), so a slot is live iff
    #         j < total draws — no per-slot segment-end column needed.
    rad8 = jnp.minimum(radius_cull, 255)
    packed0 = tmin_x | (tmin_y << 8) | (w_safe << 16) | (rad8 << 24)
    # mean2d packs into col1's top 16 bits only when the depth carrier fits
    # the low 16 (q16 always; rank iff n <= 65536); exact2 carries full f32
    # depth bits, so the cull mean rides two extra (bitcast f32) columns
    pack_mean = tile_cull and (
        depth_key == "q16"
        or (depth_key == "rank" and n <= (1 << 16)))
    col1 = rank
    if tile_cull:
        # 2-px ROUNDED quantization in EVERY mode (error <= 1 px per axis,
        # <= 1.42 px diagonal — inside the +1.5 px cull slack, so culling
        # stays conservative; identical quantization keeps rank/exact2/q16
        # culling decisions bit-equal across depth_key modes). Clipping at
        # 0 only moves an offscreen mean CLOSER to every tile (also
        # conservative), and 255 never binds while rad8 < 255.
        fx8 = jnp.clip(((mean2d[:, 0] - (tmin_x * tile).astype(jnp.float32))
                        * 0.5 + 0.5).astype(jnp.int32), 0, 255)
        fy8 = jnp.clip(((mean2d[:, 1] - (tmin_y * tile).astype(jnp.float32))
                        * 0.5 + 0.5).astype(jnp.int32), 0, 255)
    if pack_mean:
        col1 = rank | (fx8 << 16) | (fy8 << 24)
    cols = [packed0, col1, pool_ofs]
    if tile_cull and not pack_mean:
        cols += [fx8 | (fy8 << 8)]
    table = jnp.stack(cols, axis=-1)  # [N, 3 or 4]
    if table_gather == "u16":
        # bit-exact u16 reinterpretation of the int32 rows: 16-bit-element
        # gathers lower onto a much faster TPU path than 32-bit row gathers
        # at large sources (same trick as render._gather_rows_u16)
        nc = table.shape[1]
        tb = jax.lax.bitcast_convert_type(table, jnp.uint16).reshape(n, -1)
        g = jnp.take_along_axis(tb, pg[:, None], axis=0)
        tp = jax.lax.bitcast_convert_type(
            g.reshape(pool, nc, 2), jnp.int32)
    else:
        tp = jnp.take_along_axis(table, pg[:, None], axis=0)
    a = tp[:, 0]
    rank_p = tp[:, 1]
    seg_start = tp[:, 2]
    s_total = jnp.minimum(pool_ofs[n - 1] + extra[n - 1], pool)
    ok_pool = j < s_total
    aw = (a >> 16) & 0xFF
    # clamp: dead slots far past their segment would overflow the f32
    # division path (ok_pool masks them anyway)
    d_pool = jnp.minimum(inline + (j - seg_start), d_max)
    tx_p, ty_p = slot_txy(a & 0xFF, (a >> 8) & 0xFF,
                          1.0 / aw.astype(jnp.float32) * (1.0 + 1e-6), aw,
                          d_pool)
    tile_p = ty_p * n_tiles_x + tx_p
    if tile_cull:
        radp = (a >> 24) & 0xFF
        rpf = radp.astype(jnp.float32) + 1.5  # quantization slack
        if pack_mean:
            fx_p = (rank_p >> 16) & 0xFF
            fy_p = (rank_p >> 24) & 0xFF
            rank_p = rank_p & 0xFFFF
        else:
            fx_p = tp[:, 3] & 0xFF
            fy_p = (tp[:, 3] >> 8) & 0xFF
        mx_p = ((a & 0xFF) * tile + fx_p * 2).astype(jnp.float32)
        my_p = (((a >> 8) & 0xFF) * tile + fy_p * 2).astype(jnp.float32)
        ok_pool = ok_pool & (
            (radp >= 255) | circle_ok(tx_p, ty_p, mx_p, my_p, rpf * rpf))
    if two_key:
        key_pool = jnp.where(ok_pool, tile_p, sentinel_key)
        sub_pool = rank_p
    else:
        key_pool = jnp.where(ok_pool, (tile_p << rank_bits) | rank_p,
                             sentinel_key)

    # ONE sort carrying at most TWO operands: (keys, gid). r4 probe_gbwd: a
    # THIRD sort operand costs ~2.8 ms at 450k — the XLA TPU kv-sort fast
    # path is 2-operand only. XLA handles non-pow2 sizes fine (an explicit
    # pow2 pad measured ~10 ms slower) — so no explicit pad.
    keys = jnp.concatenate([key_in, key_pool])
    gid_all = jnp.concatenate([gid_in, pg])
    # the emission-index payload is only needed for post-sort gid recovery
    # (carry_gid=False) — don't pay for a dead sort operand otherwise
    if two_key:
        subs = jnp.concatenate([sub_in, sub_pool])
    key_ops = (keys, subs) if two_key else (keys,)
    if carry_gid:
        ops = key_ops + (gid_all,)
    else:
        ops = key_ops + (jnp.arange(e, dtype=jnp.int32),)
    # (a VMEM-resident bitonic pallas sort was tried here in r4 and FAILED
    # Mosaic lowering at production sizes — measured dead end, removed r5)
    sorted_ops = jax.lax.sort(ops, num_keys=len(key_ops),
                              is_stable=sort_stable)
    keys_c = sorted_ops[0][:e]
    em = None if carry_gid else sorted_ops[-1][:e]
    gid_s = sorted_ops[-1] if carry_gid else None

    tile_sorted = (keys_c if two_key
                   else (keys_c >> rank_bits)).astype(jnp.int32)
    live = keys_c != sentinel_key
    if carry_gid:
        gidx = jnp.where(live, gid_s[:e], n)
    else:
        # recover the gaussian id with one post-sort gather from the
        # emission-order gid table (em is an exact permutation of [0, e)) —
        # trades the third sort payload for one 450k gather
        gidx = jnp.where(live, gid_all[em], n)

    # one searchsorted over nt+1 boundaries: ends[t] == starts_ext[t+1]
    bounds = jnp.searchsorted(
        tile_sorted, jnp.arange(nt + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    starts = bounds[:nt]
    counts = bounds[1:] - bounds[:nt]

    return Binning(
        gidx=gidx,
        tile_of=jnp.where(live, tile_sorted, nt),
        starts=starts,
        counts=counts,
        n_dropped=n_dropped,
    )
