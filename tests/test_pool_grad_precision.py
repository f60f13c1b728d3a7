"""Gradient-accuracy bound for the pool-tier cumsum-difference reduction.

ADVICE r02: `_gather_rows_bwd` (render.py) reduces pool-tier per-instance
gradients to per-gaussian gradients as a difference of f32 global prefix
sums, so rounding error scales with the prefix magnitude — gaussians
allocated late in a large pool could in principle receive gradients
dominated by cancellation. This test bounds that error at a production-scale
pool (256k slots) against an exact float64 scatter-add reference.
"""

import numpy as np
import jax
import jax.numpy as jnp
from gaussianip_tpu.render.binning import INLINE, bin_instances
from gaussianip_tpu.render.render import _gather_rows


def test_pool_reduction_error_bound_at_production_pool():
    rng = np.random.default_rng(7)
    n = 100_000
    pool = 262_144  # ~production scale (ADVICE asked for >= ~250k)
    chunk = 128
    tile = 16
    res = 1024
    ntx = nty = res // tile

    # screen-space layout with many large footprints so the pool tier fills
    mean2d = rng.uniform(0, res, (n, 2)).astype(np.float32)
    radius = rng.integers(8, 80, (n,)).astype(np.int32)  # up to 5x5+ tiles
    depth = rng.uniform(0.5, 5.0, (n,)).astype(np.float32)
    valid = np.ones((n,), bool)

    binning = bin_instances(
        jnp.asarray(mean2d), jnp.asarray(radius), jnp.asarray(depth),
        jnp.asarray(valid), tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
        d_max=25, pool=pool, chunk=chunk, with_inv=True,
    )
    e = INLINE * n + pool
    # most of the pool should actually be live for the bound to mean anything
    n_pool_live = int(jnp.sum(binning.pool_len))
    assert n_pool_live > pool // 2

    c = 4  # gradient row width (enough to exercise the reduction)
    dinst = rng.normal(0, 1, (e, c)).astype(np.float32)

    packed = jnp.asarray(rng.normal(0, 1, (n, c)).astype(np.float32))
    _, vjp = jax.vjp(
        lambda p: _gather_rows(p, binning.gidx, n, INLINE,
                               binning.inv_em,
                               binning.pool_ofs, binning.pool_len),
        packed,
    )
    (dpacked,) = vjp(jnp.asarray(dinst))
    dpacked = np.asarray(dpacked)

    # exact float64 scatter-add reference over the same emission layout
    gidx = np.asarray(binning.gidx)
    live = gidx < n
    ref = np.zeros((n, c), np.float64)
    np.add.at(ref, gidx[live], dinst[live].astype(np.float64))

    err = np.abs(dpacked - ref)
    # scale-aware bound: error relative to the typical per-gaussian gradient
    # magnitude (~sqrt(instances/gaussian) for unit-normal contributions)
    scale = max(np.sqrt(np.mean(ref**2)), 1e-12)
    rel = err / scale
    # f32 cumsum over ~260k unit-normal values has prefix magnitude
    # ~sqrt(pool) ~ 500; eps*prefix ~ 6e-5 absolute — orders below the
    # gradient scale. Bound with wide margin; regression-guards the layout.
    assert np.max(rel) < 5e-3, (np.max(rel), np.mean(rel))
    assert np.mean(rel) < 2e-4
