"""Isolate the v2 kernel's per-program fixed overhead: time zero-count grids
for kernel variants (full v2; no drain; no dynamic slot; no tri build)."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianip_tpu.render.composite_pallas import (_pixel_features, _tri,
                                                    _data_copy, _chunk_alphas,
                                                    _dot)

B, NT, CHUNK, TILE = 1, 4096, 128, 16
P = TILE * TILE
EPAD = 1024 * 800

dev = jax.devices()[0]
rng = np.random.default_rng(0)
data = jax.device_put(jnp.zeros((B, 16, EPAD), jnp.float32), dev)
starts = jax.device_put(jnp.zeros((B, NT), jnp.int32), dev)
cnts0 = jax.device_put(jnp.zeros((B, NT), jnp.int32), dev)


def grid_spec():
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, P), lambda bb, tt, sb, st: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, P),
                               lambda bb, tt, sb, st: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def make(kernel):
    featpix = _pixel_features(TILE)

    @jax.jit
    def run(starts, cnts):
        s = jnp.float32(0.0)
        for _ in range(4):
            out = pl.pallas_call(
                functools.partial(kernel, chunk=CHUNK, tile=TILE),
                grid_spec=grid_spec(),
                out_shape=jax.ShapeDtypeStruct((B, NT, 8, P), jnp.float32),
            )(starts + (s.astype(jnp.int32) & 1), cnts, data, featpix)
            s = jnp.sum(out[:, ::64, :5])
        return s
    return run


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
    return jnp.sum(x[0, :, :8])


t_rpc = timeit(trivial, data)
print(f"rpc_floor={t_rpc*1000:.1f}ms")


# variant 1: out zero + last row only (minimal body)
def k_min(starts_ref, counts_ref, data_hbm, featpix_ref, out_ref, buf, sems,
          *, chunk, tile):
    p = tile * tile
    out_ref[0, 0] = jnp.zeros((8, p), jnp.float32)


# variant 2: + scalar reads and nchunks math
def k_scalars(starts_ref, counts_ref, data_hbm, featpix_ref, out_ref, buf,
              sems, *, chunk, tile):
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = starts_ref[b, t]
    count = counts_ref[b, t]
    base = (start // chunk) * chunk
    head = start - base
    total = head + count
    nchunks = (total + chunk - 1) // chunk
    p = tile * tile
    out_ref[0, 0] = jnp.zeros((8, p), jnp.float32)
    out_ref[0, 0, 5:6, :] = jnp.full((1, p), -1.0, jnp.float32) + nchunks


# variant 3: + featpix load + tri build
def k_tri(starts_ref, counts_ref, data_hbm, featpix_ref, out_ref, buf, sems,
          *, chunk, tile):
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = starts_ref[b, t]
    count = counts_ref[b, t]
    nchunks = (start - start + count + chunk - 1) // chunk
    p = tile * tile
    featpix = featpix_ref[:]
    tri = _tri(chunk, strict=True, upper=False)
    out_ref[0, 0] = jnp.zeros((8, p), jnp.float32)
    out_ref[0, 0, 5:6, :] = (jnp.full((1, p), -1.0, jnp.float32)
                             + tri[0, 0] + featpix[0, 0] + nchunks)


# variant 4: + initial DMA start guarded (never fires: counts 0)
def k_dma(starts_ref, counts_ref, data_hbm, featpix_ref, out_ref, buf, sems,
          *, chunk, tile):
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = starts_ref[b, t]
    count = counts_ref[b, t]
    base = (start // chunk) * chunk
    head = start - base
    nchunks = (head + count + chunk - 1) // chunk
    p = tile * tile
    featpix = featpix_ref[:]
    out_ref[0, 0] = jnp.zeros((8, p), jnp.float32)

    @pl.when(nchunks > 0)
    def _():
        _data_copy(data_hbm, buf, sems, b, base, 0, 0, chunk).start()
        _data_copy(data_hbm, buf, sems, b, base, 0, 0, chunk).wait()

    out_ref[0, 0, 5:6, :] = jnp.full((1, p), -1.0, jnp.float32) + nchunks


# variant 5: the real v2 fwd kernel
from gaussianip_tpu.render.composite_pallas import _fwd_kernel

for name, k in [("min", k_min), ("scalars", k_scalars), ("tri", k_tri),
                ("dma_guarded", k_dma), ("v2_full", _fwd_kernel)]:
    t = max(timeit(make(k), starts, cnts0) - t_rpc, 1e-9) / 4
    print(f"{name:12s} zero-count grid: {t*1000:7.2f} ms "
          f"({t/NT*1e9:.0f} ns/program)")
