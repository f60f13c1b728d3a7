"""Tile binning: gaussians -> depth-ordered per-tile instance segments.

TPU-native replacement for the CUDA duplicate+radix-sort binning inside
diff-gaussian-rasterization (consumed at reference:
gaussiansplatting/gaussian_renderer/__init__.py:85-93). Differences by design:

  * static shapes everywhere: each gaussian emits up to D_MAX instances
    (its tile rect, row-major, truncated — footprints beyond D_MAX tiles are
    clipped, which only affects gaussians larger than the reference's own
    screen-size prune threshold);
  * one single-key stable sort: key = tile_id << rank_bits | depth_rank,
    where depth_rank comes from one cheap N-element argsort — instances land
    grouped by tile, depth-ordered within each tile, and invalid slots
    (sentinel keys) sink to the tail, so *compaction falls out of the sort*
    (a slice), with no scatter;
  * segments are then scattered once into a CHUNK-aligned layout so the
    Pallas compositor's DMAs are lane-aligned and forward/backward chunk
    windows of different tiles never overlap (race-free backward writes).

Everything here is integer index work and runs under stop_gradient; the
differentiable attribute gather happens in render.py (one wide packed gather
— TPU gathers amortize over row width, not row count).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import tile_rect


class Binning(NamedTuple):
    gidx: jnp.ndarray  # [IPAD] gaussian index per instance row (N = invalid)
    tile_of: jnp.ndarray  # [IPAD] tile id per row (NT = invalid)
    starts: jnp.ndarray  # [NT] CHUNK-aligned segment starts
    counts: jnp.ndarray  # [NT] live instance counts per tile
    n_dropped: jnp.ndarray  # int32: instances lost to icap overflow


@functools.partial(
    jax.jit,
    static_argnames=("tile", "n_tiles_x", "n_tiles_y", "d_max", "icap", "chunk"),
)
def bin_instances(
    mean2d,
    radius,
    depth,
    valid,
    *,
    tile: int,
    n_tiles_x: int,
    n_tiles_y: int,
    d_max: int,
    icap: int,
    chunk: int,
):
    n = mean2d.shape[0]
    nt = n_tiles_x * n_tiles_y
    rank_bits = max(1, (n - 1).bit_length())
    assert (nt + 1) < (1 << (31 - rank_bits)), "tile/rank bits exceed int32"
    assert icap % chunk == 0, "icap must be a multiple of chunk"
    sentinel_key = jnp.int32(nt << rank_bits)

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

    # global depth ranks (stable; invalid sink to the end)
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf), stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    d = jnp.arange(d_max, dtype=jnp.int32)
    w_safe = jnp.maximum(w, 1)
    dy = d[None, :] // w_safe[:, None]
    dx = d[None, :] % w_safe[:, None]
    tile_id = (tmin_y[:, None] + dy) * n_tiles_x + (tmin_x[:, None] + dx)  # [N, D]
    inst_ok = d[None, :] < count[:, None]
    key = jnp.where(
        inst_ok, (tile_id << rank_bits) | rank[:, None], sentinel_key
    ).reshape(-1)

    # sort-compaction: one KEY-ONLY sort (the gaussian id is recoverable from
    # the embedded depth rank via the argsort order — no value array to carry
    # through the sort); live instances form the prefix. (Measured: a
    # cumsum+scatter pre-compaction is SLOWER than XLA's sort.)
    if key.shape[0] < icap:  # capacity exceeds the instance universe
        key = jnp.pad(key, (0, icap - key.shape[0]),
                      constant_values=sentinel_key)
    keys_s = jax.lax.sort(key)
    n_live = jnp.sum(inst_ok.astype(jnp.int32))
    keys_c = keys_s[:icap]
    rank_mask = (1 << rank_bits) - 1
    live_key = keys_c != sentinel_key
    order32 = order.astype(jnp.int32)
    gidx_c = jnp.where(
        live_key, order32[jnp.minimum(keys_c & rank_mask, n - 1)], n)
    tile_sorted = (keys_c >> rank_bits).astype(jnp.int32)

    tile_ids = jnp.arange(nt, dtype=jnp.int32)
    seg_start = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
    seg_end = jnp.searchsorted(tile_sorted, tile_ids + 1, side="left").astype(
        jnp.int32
    )
    counts = seg_end - seg_start

    # CHUNK-aligned re-layout (one int scatter pair)
    aligned_sizes = ((counts + chunk - 1) // chunk) * chunk
    aligned_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_sizes)[:-1].astype(jnp.int32)]
    )
    ipad = icap + nt * chunk
    live_row = tile_sorted < nt
    t_clip = jnp.minimum(tile_sorted, nt - 1)
    within = jnp.arange(icap, dtype=jnp.int32) - seg_start[t_clip]
    new_pos = jnp.where(live_row, aligned_starts[t_clip] + within, ipad)
    gidx_a = jnp.full((ipad,), n, jnp.int32).at[new_pos].set(gidx_c, mode="drop")
    tile_a = jnp.full((ipad,), nt, jnp.int32).at[new_pos].set(
        tile_sorted, mode="drop"
    )

    return Binning(
        gidx=gidx_a,
        tile_of=tile_a,
        starts=aligned_starts,
        counts=counts,
        n_dropped=jnp.maximum(n_live - icap, 0).astype(jnp.int32),
    )
