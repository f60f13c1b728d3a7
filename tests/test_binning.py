"""Binning invariants: segment layout, depth ordering, footprint clamping,
overflow accounting — against a direct numpy reconstruction."""

import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.render.binning import bin_instances


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
    mean2d, radius, depth, valid = _scene(rng, n, w, h)
    b = bin_instances(jnp.asarray(mean2d), jnp.asarray(radius),
                      jnp.asarray(depth), jnp.asarray(valid),
                      tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
                      d_max=25, icap=128 * 64, chunk=chunk)
    starts = np.asarray(b.starts)
    counts = np.asarray(b.counts)
    gidx = np.asarray(b.gidx)
    tile_of = np.asarray(b.tile_of)
    nt = ntx * nty
    assert int(b.n_dropped) == 0

    # chunk alignment + segments don't overlap
    assert (starts % chunk == 0).all()
    ends = starts + ((counts + chunk - 1) // chunk) * chunk
    assert (starts[1:] >= ends[:-1]).all()
    for t in range(nt):
        rows = np.arange(starts[t], starts[t] + counts[t])
        assert (tile_of[rows] == t).all()
        assert (gidx[rows] < n).all()
        # depth strictly non-decreasing within the segment
        d = depth[gidx[rows]]
        assert (np.diff(d) >= -1e-6).all()
        # rows between count and the chunk boundary are invalid
        pad_rows = np.arange(starts[t] + counts[t], ends[t])
        assert (gidx[pad_rows] == n).all()

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


def test_binning_overflow_accounting(rng):
    n, tile = 200, 16
    mean2d = np.full((n, 2), 40.0, np.float32)  # tile interior: 1 dup each
    radius = np.full(n, 5, np.int32)
    depth = rng.uniform(0.5, 2.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    icap = 128  # force overflow: 200 instances > 128
    b = bin_instances(jnp.asarray(mean2d), jnp.asarray(radius),
                      jnp.asarray(depth), jnp.asarray(valid),
                      tile=tile, n_tiles_x=8, n_tiles_y=8,
                      d_max=9, icap=icap, chunk=128)
    assert int(b.n_dropped) == n - icap
    # the kept prefix is the NEAREST instances (sorted by depth rank)
    kept = np.asarray(b.gidx)[np.asarray(b.gidx) < n]
    kept_depths = depth[kept]
    dropped_min = np.sort(depth)[icap:].min()
    assert kept_depths.max() <= dropped_min + 1e-6


def test_binning_centered_clamp(rng):
    # one huge gaussian: footprint must be a centered side x side window
    mean2d = np.array([[64.0, 64.0]], np.float32)
    radius = np.array([200], np.int32)
    depth = np.array([1.0], np.float32)
    valid = np.array([True])
    b = bin_instances(jnp.asarray(mean2d), jnp.asarray(radius),
                      jnp.asarray(depth), jnp.asarray(valid),
                      tile=16, n_tiles_x=8, n_tiles_y=8,
                      d_max=9, icap=128, chunk=128)
    tiles = np.asarray(b.tile_of)[np.asarray(b.gidx) < 1]
    assert len(tiles) == 9
    tx, ty = tiles % 8, tiles // 8
    # centered on tile (4, 4)
    assert set(tx) == {3, 4, 5} and set(ty) == {3, 4, 5}
