"""Binning invariants (two-tier emission): segment layout, depth ordering,
footprint clamping, pool-overflow accounting — against a direct numpy
reconstruction."""

import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.render.binning import INLINE, bin_instances


def _scene(rng, n, w, h):
    mean2d = np.stack([rng.uniform(-10, w + 10, n),
                       rng.uniform(-10, h + 10, n)], 1).astype(np.float32)
    radius = rng.integers(0, 40, n).astype(np.int32)
    depth = rng.uniform(0.3, 5.0, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.15
    return mean2d, radius, depth, valid


def test_binning_invariants(rng):
    n, w, h, tile, chunk = 300, 128, 128, 16, 128
    ntx = nty = w // tile
    pool = 50 * chunk
    mean2d, radius, depth, valid = _scene(rng, n, w, h)
    b = bin_instances(jnp.asarray(mean2d), jnp.asarray(radius),
                      jnp.asarray(depth), jnp.asarray(valid),
                      tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
                      d_max=25, pool=pool, chunk=chunk)
    starts = np.asarray(b.starts)
    counts = np.asarray(b.counts)
    gidx = np.asarray(b.gidx)
    tile_of = np.asarray(b.tile_of)
    nt = ntx * nty
    assert int(b.n_dropped) == 0

    # segments tile the live prefix contiguously, in tile order
    ends = starts + counts
    assert (starts[1:] == ends[:-1]).all()
    assert starts[0] == 0
    n_live = ends[-1]
    assert (gidx[:n_live] < n).all()
    assert (gidx[n_live:] == n).all()
    for t in range(nt):
        rows = np.arange(starts[t], ends[t])
        assert (tile_of[rows] == t).all()
        # depth strictly non-decreasing within the segment
        d = depth[gidx[rows]]
        assert (np.diff(d) >= -1e-6).all()

    # every (valid, on-screen) gaussian lands in its center tile's segment
    for g in rng.integers(0, n, 20):
        if not valid[g] or radius[g] == 0:
            continue
        cx, cy = mean2d[g]
        if not (0 <= cx < w and 0 <= cy < h):
            continue
        t = int(cy // tile) * ntx + int(cx // tile)
        rows = np.arange(starts[t], starts[t] + counts[t])
        assert g in gidx[rows]


def test_binning_depth_key_modes(rng):
    # exact2 (two-key lexicographic sort, no N argsort) must reproduce the
    # rank scheme bit-for-bit when per-tile depths are distinct (random f32
    # depths are distinct a.s.); q16 must preserve segment membership and
    # order depths within the quantization tolerance.
    n, w, h, tile, chunk = 300, 128, 128, 16, 128
    ntx = nty = w // tile
    pool = 50 * chunk
    mean2d, radius, depth, valid = _scene(rng, n, w, h)
    args = (jnp.asarray(mean2d), jnp.asarray(radius), jnp.asarray(depth),
            jnp.asarray(valid))
    kw = dict(tile=tile, n_tiles_x=ntx, n_tiles_y=nty, d_max=25, pool=pool,
              chunk=chunk)
    ref = bin_instances(*args, depth_key="rank", **kw)
    two = bin_instances(*args, depth_key="exact2", **kw)
    for a, b in zip(ref, two):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    q = bin_instances(*args, depth_key="q16", **kw)
    np.testing.assert_array_equal(np.asarray(ref.starts),
                                  np.asarray(q.starts))
    np.testing.assert_array_equal(np.asarray(ref.counts),
                                  np.asarray(q.counts))
    starts, counts = np.asarray(q.starts), np.asarray(q.counts)
    gidx = np.asarray(q.gidx)
    tol = (depth[valid].max() - depth[valid].min()) / 65535.0
    for t in range(ntx * nty):
        rows = np.arange(starts[t], starts[t] + counts[t])
        refrows = np.arange(starts[t], starts[t] + counts[t])
        # same membership per tile, near-sorted depths
        assert set(gidx[rows]) == set(np.asarray(ref.gidx)[refrows])
        d = depth[gidx[rows]]
        assert (np.diff(d) >= -tol - 1e-6).all()


def test_binning_pool_overflow_accounting(rng):
    # every gaussian has a 9-tile footprint -> 5 pool draws each; pool of
    # one chunk holds 128 -> 25 gaussians fully served, rest truncated
    n, tile = 200, 16
    mean2d = np.full((n, 2), 40.0, np.float32)
    radius = np.full(n, 24, np.int32)  # 3x3 tiles
    depth = rng.uniform(0.5, 2.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    pool = 128
    b = bin_instances(jnp.asarray(mean2d), jnp.asarray(radius),
                      jnp.asarray(depth), jnp.asarray(valid),
                      tile=tile, n_tiles_x=8, n_tiles_y=8,
                      d_max=25, pool=pool, chunk=128, inline=4)
    want_extra = n * 5  # 9 tiles - 4 inline
    assert int(b.n_dropped) == want_extra - pool
    # all inline instances and exactly `pool` extras survive
    gidx = np.asarray(b.gidx)
    assert (gidx < n).sum() == n * 4 + pool


def test_binning_centered_clamp(rng):
    # one huge gaussian: footprint must be a centered side x side window
    mean2d = np.array([[64.0, 64.0]], np.float32)
    radius = np.array([200], np.int32)
    depth = np.array([1.0], np.float32)
    valid = np.array([True])
    b = bin_instances(jnp.asarray(mean2d), jnp.asarray(radius),
                      jnp.asarray(depth), jnp.asarray(valid),
                      tile=16, n_tiles_x=8, n_tiles_y=8,
                      d_max=9, pool=128, chunk=128)
    tiles = np.asarray(b.tile_of)[np.asarray(b.gidx) < 1]
    assert len(tiles) == 9
    tx, ty = tiles % 8, tiles // 8
    # centered on tile (4, 4)
    assert set(tx) == {3, 4, 5} and set(ty) == {3, 4, 5}
