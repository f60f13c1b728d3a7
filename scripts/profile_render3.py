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
from gaussianip_tpu.render.render import (RenderConfig, _auto_pool,
                                            _gather_rows)
from gaussianip_tpu.render.binning import INLINE, bin_instances
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
pool = _auto_pool(n, chunk, res, res)
e_tot = INLINE * n + pool
epad = (-(-(e_tot + chunk) // chunk)) * chunk + chunk

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
    pool=pool, chunk=chunk, with_inv=True)))(
    proj.mean2d, proj.radius, proj.depth, proj.valid)

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

# build kernel inputs once (v2 packing)
packed = jnp.concatenate([
    proj.mean2d, proj.conic, (proj.opacity * jnp.ones((batch, n)))[..., None],
    proj.color, proj.depth[..., None]], axis=-1)
inst = _gather_rows(packed, binning.gidx, n, binning.inv_em,
                    binning.pool_ofs, binning.pool_len)
rv = (binning.gidx < n)[..., None]
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
data = jnp.swapaxes(jnp.concatenate([coeff8, feat8], axis=-1), 1, 2)
data = jax.device_put(jnp.pad(data, ((0, 0), (0, 0), (0, epad - e_tot))), dev)
starts, cnts = jax.device_put((binning.starts, binning.counts), dev)
gidx_d, inv_d, pofs_d, plen_d, packed_d = jax.device_put(
    (binning.gidx, binning.inv_em, binning.pool_ofs, binning.pool_len,
     packed), dev)

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


t_rpc = timeit(trivial, data)
print(f"rpc_floor_ms={t_rpc*1000:.2f}")
K = 6


@jax.jit
def kfwd(data):
    s = jnp.float32(0.0)
    for _ in range(K):
        out = composite_tiles(data + s * 1e-12, starts, cnts, tile, chunk,
                              False)
        s = jnp.sum(out[:, :, :5, :])
    return s


t = max(timeit(kfwd, data) - t_rpc, 1e-9) / K
print(f"composite fwd kernel only: {t*1000:8.2f} ms")


def kloss(data):
    out = composite_tiles(data, starts, cnts, tile, chunk, False)
    return jnp.sum(out[:, :, :5, :] ** 2)


@jax.jit
def kfb(data):
    s = jnp.float32(0.0)
    for _ in range(K):
        g1 = jax.grad(kloss)(data + s * 1e-12)
        s = jnp.sum(g1[:, :, ::64])
    return s


t_fb = max(timeit(kfb, data) - t_rpc, 1e-9) / K
print(f"composite fwd+bwd kernel:  {t_fb*1000:8.2f} ms")

# gather fwd alone
@jax.jit
def gfwd(packed):
    s = jnp.float32(0.0)
    for _ in range(K):
        inst = _gather_rows(packed + s * 1e-12, gidx_d, n, inv_d, pofs_d,
                            plen_d)
        s = jnp.sum(inst[:, ::64])
    return s


t_g = max(timeit(gfwd, packed_d) - t_rpc, 1e-9) / K
print(f"gather fwd alone:          {t_g*1000:8.2f} ms")


def gloss(packed):
    inst = _gather_rows(packed, gidx_d, n, inv_d, pofs_d, plen_d)
    return jnp.sum(inst ** 2)


@jax.jit
def gfb(packed):
    s = jnp.float32(0.0)
    for _ in range(K):
        g1 = jax.grad(gloss)(packed + s * 1e-12)
        s = jnp.sum(g1[:, ::64])
    return s


t_gb = max(timeit(gfb, packed_d) - t_rpc, 1e-9) / K
print(f"gather fwd+bwd (reduction):{t_gb*1000:8.2f} ms")

cnts0 = jnp.zeros_like(cnts)


@jax.jit
def kempty(data):
    s = jnp.float32(0.0)
    for _ in range(K):
        out = composite_tiles(data + s * 1e-12, starts, cnts0, tile, chunk,
                              False)
        s = jnp.sum(out[:, :, :5, :])
    return s


t_n = max(timeit(kempty, data) - t_rpc, 1e-9) / K
print(f"fwd kernel, zero counts:   {t_n*1000:8.2f} ms")
