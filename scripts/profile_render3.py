"""Isolate the Pallas compositor fwd/bwd cost and per-program overhead,
plus live-instance stats for the bench scene at 1024^2."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianip_tpu.data.cameras import camera_from_c2w
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.camera_math import look_at_c2w
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig, _auto_icap
from gaussianip_tpu.render.binning import bin_instances
from gaussianip_tpu.render.preprocess import (gaussian_power_coeffs,
                                              project_gaussians)
from gaussianip_tpu.render.composite_pallas import composite_tiles

dev = jax.devices()[0]
res, batch, n = 1024, 1, 100_000
rng = np.random.default_rng(0)
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
state = jax.device_put(state, dev)

az = jnp.linspace(0, 2 * jnp.pi, batch, endpoint=False)
eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                 jnp.full((batch,), 0.2)], -1)
c2w = look_at_c2w(eye, jnp.zeros((batch, 3)),
                  jnp.tile(jnp.array([[0.0, 0, 1]]), (batch, 1)))
cams = jax.device_put(jax.vmap(
    lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w), dev)
cfg = RenderConfig(backend="pallas")
tile, chunk, d_max = cfg.tile, cfg.chunk, cfg.d_max
ntx = nty = res // tile
nt = ntx * nty
icap = _auto_icap(n, d_max, chunk, res, res)
ipad = icap + nt * chunk

deg = state.active_sh_degree
xyz, scales = state.xyz, state.get_scaling()
opac, feats = state.get_opacity()[:, 0], state.get_features()
active = state.active_mask()
off = jnp.zeros((batch, n, 2))
proj = jax.jit(jax.vmap(lambda cam, o: project_gaussians(
    xyz, scales, state.rotation, opac, feats, cam, deg, 1.0, o, None,
    active)))(cams, off)
binning = jax.jit(jax.vmap(functools.partial(
    bin_instances, tile=tile, n_tiles_x=ntx, n_tiles_y=nty, d_max=d_max,
    icap=icap, chunk=chunk)))(proj.mean2d, proj.radius, proj.depth, proj.valid)

counts = np.asarray(binning.counts[0])
w = np.asarray(proj.valid[0])
print(f"live instances: {counts.sum()}  n_dropped={int(binning.n_dropped[0])}")
print(f"chunks total: {int(np.ceil(counts / chunk).sum())}  "
      f"tiles nonzero: {(counts > 0).sum()}/{nt}  max count: {counts.max()}")
# footprint histogram
mean2d, radius = proj.mean2d[0], proj.radius[0]
from gaussianip_tpu.render.preprocess import tile_rect
tx0, ty0, tx1, ty1 = tile_rect(mean2d, radius, tile, ntx, nty)
fp = np.asarray((tx1 - tx0) * (ty1 - ty0))[np.asarray(proj.valid[0])]
print("footprint tiles percentiles:",
      {p: int(np.percentile(fp, p)) for p in (50, 90, 99, 100)},
      "frac>4:", float((fp > 4).mean()), "sum extra:", int(np.maximum(fp - 4, 0).sum()),
      "sum:", int(fp.sum()))

# build kernel inputs once
packed = jnp.concatenate([
    proj.mean2d, proj.conic, (proj.opacity * jnp.ones((batch, n)))[..., None],
    proj.color, proj.depth[..., None]], axis=-1)
gidx_safe = jnp.minimum(binning.gidx, n - 1)
inst = jnp.take_along_axis(packed, gidx_safe[..., None], axis=1)
rv = (binning.gidx < n)[..., None]
inst = jnp.where(rv, inst, 0.0)
tile_safe = jnp.minimum(binning.tile_of, nt - 1)
origin = jnp.stack([(tile_safe % ntx) * tile, (tile_safe // ntx) * tile],
                   axis=-1).astype(jnp.float32)
local = inst[..., 0:2] - origin
coeff6 = gaussian_power_coeffs(local, inst[..., 2:5], inst[..., 5])
coeff8 = jnp.where(rv, jnp.concatenate(
    [coeff6, jnp.zeros_like(coeff6[..., :2])], axis=-1), 0.0)
ones = jnp.ones_like(inst[..., 9])
zeros = jnp.zeros_like(ones)
feat8 = jnp.where(rv, jnp.stack(
    [inst[..., 6], inst[..., 7], inst[..., 8], inst[..., 9], ones, zeros,
     zeros, zeros], axis=-1), 0.0)
coeff_t = jax.device_put(jnp.swapaxes(coeff8, 1, 2), dev)
feat_t = jax.device_put(jnp.swapaxes(feat8, 1, 2), dev)
starts, cnts = jax.device_put((binning.starts, binning.counts), dev)


@jax.jit
def trivial(x):
    return jnp.sum(x[0, 0, :8])


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t_rpc = timeit(trivial, coeff_t)
print(f"rpc_floor_ms={t_rpc*1000:.2f}")
K = 6


@jax.jit
def kfwd(coeff_t, feat_t):
    s = jnp.float32(0.0)
    for _ in range(K):
        out = composite_tiles(coeff_t + s * 1e-12, feat_t, starts, cnts,
                              tile, chunk, False)
        s = jnp.sum(out[:, :, :5, :])
    return s


t = max(timeit(kfwd, coeff_t, feat_t) - t_rpc, 1e-9) / K
print(f"composite fwd kernel only: {t*1000:8.2f} ms")


def kloss(coeff_t, feat_t):
    out = composite_tiles(coeff_t, feat_t, starts, cnts, tile, chunk, False)
    return jnp.sum(out[:, :, :5, :] ** 2)


@jax.jit
def kfb(coeff_t, feat_t):
    s = jnp.float32(0.0)
    for _ in range(K):
        g1, g2 = jax.grad(kloss, argnums=(0, 1))(coeff_t + s * 1e-12, feat_t)
        s = jnp.sum(g1[:, :, ::64]) + jnp.sum(g2[:, :, ::64])
    return s


t_fb = max(timeit(kfb, coeff_t, feat_t) - t_rpc, 1e-9) / K
print(f"composite fwd+bwd kernel:  {t_fb*1000:8.2f} ms")

# coeff build + swapaxes alone
@jax.jit
def build(inst_in):
    s = jnp.float32(0.0)
    x = inst_in
    for _ in range(K):
        local = x[..., 0:2] - origin
        c6 = gaussian_power_coeffs(local, x[..., 2:5], x[..., 5])
        c8 = jnp.where(rv, jnp.concatenate(
            [c6, jnp.zeros_like(c6[..., :2])], axis=-1), 0.0)
        ct = jnp.swapaxes(c8, 1, 2)
        s = jnp.sum(ct[:, :, ::64])
        x = inst_in + s * 1e-12
    return s


t_b = max(timeit(build, inst) - t_rpc, 1e-9) / K
print(f"coeff build + swap:        {t_b*1000:8.2f} ms")

# no-op kernel, grid (1, 4096): per-program overhead
def nop_kernel(starts_ref, counts_ref, x_hbm, o_ref, buf, sem):
    b = pl.program_id(0)
    t_ = pl.program_id(1)
    o_ref[0, 0] = jnp.float32(t_) + jnp.float32(starts_ref[b, t_])


@jax.jit
def nop(starts):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1), lambda b, t, s1, s2: (b, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,))],
    )
    s = jnp.float32(0.0)
    for _ in range(K):
        out = pl.pallas_call(
            nop_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, nt), jnp.float32),
        )(starts + (s.astype(jnp.int32) & 1), cnts, coeff_t)
        s = jnp.sum(out[:, ::64])
    return s


t_n = max(timeit(nop, starts) - t_rpc, 1e-9) / K
print(f"no-op kernel grid 4096:    {t_n*1000:8.2f} ms")
