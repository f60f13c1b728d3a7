"""Backward-pass decomposition: pallas bwd kernel vs gather-reduction vs rest.

Times (a) composite_tiles VJP alone on concrete binning data, (b) the
_gather_rows VJP alone, against the full fwd+bwd chain.
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
from gaussianip_tpu.render.render import (RenderConfig, _auto_pool,
                                          _gather_rows)
from gaussianip_tpu.render.binning import INLINE, bin_instances
from gaussianip_tpu.render.composite_pallas import composite_tiles
from gaussianip_tpu.render.preprocess import (gaussian_power_coeffs,
                                              project_gaussians)

rng = np.random.default_rng(0)
n = 100_000
res = 1024
batch = 1

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

az = jnp.linspace(0, 2 * jnp.pi, batch, endpoint=False)
eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                 jnp.full((batch,), 0.2)], -1)
c2w = look_at_c2w(eye, jnp.zeros((batch, 3)),
                  jnp.tile(jnp.array([[0.0, 0, 1]]), (batch, 1)))
cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
cfg = RenderConfig(backend="pallas")
tile, chunk, d_max = cfg.tile, cfg.chunk, cfg.d_max
ntx = nty = res // tile
pool = _auto_pool(n, chunk, res, res)
e = INLINE * n + pool
epad = (-(-(e + chunk) // chunk)) * chunk + chunk
p = tile * tile
nt = ntx * nty
K = 4

# ---- concrete binning data (untimed) ----


@jax.jit
def build(state):
    off = jnp.zeros((batch, n, 2))
    proj = jax.vmap(
        lambda cam, o: project_gaussians(
            state.xyz, state.get_scaling(), state.rotation,
            state.get_opacity()[:, 0], state.get_features(), cam,
            state.active_sh_degree, 1.0, o, None,
            state.active_mask()))(cams, off)
    binning = jax.vmap(
        lambda m, r_, z_, v: bin_instances(
            m, r_, z_, v, tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
            d_max=d_max, pool=pool, chunk=chunk, with_inv=True,
        ))(proj.mean2d, proj.radius_bin, proj.depth, proj.valid)
    packed = jnp.concatenate(
        [proj.mean2d, proj.conic,
         (proj.opacity * jnp.ones((batch, n)))[..., None], proj.color,
         proj.depth[..., None]], axis=-1)
    inst = _gather_rows(packed, binning.gidx, n, INLINE, binning.inv_em,
                        binning.pool_ofs, binning.pool_len)
    rv = (binning.gidx < n)[..., None]
    tile_safe = jnp.minimum(binning.tile_of, nt - 1)
    origin = jnp.stack(
        [(tile_safe % ntx) * tile, (tile_safe // ntx) * tile], -1
    ).astype(jnp.float32)
    local = inst[..., 0:2] - origin
    coeff6 = gaussian_power_coeffs(local, inst[..., 2:5], inst[..., 5])
    coeff8 = jnp.where(
        rv, jnp.concatenate([coeff6, jnp.zeros_like(coeff6[..., :2])], -1),
        0.0)
    ones = jnp.ones_like(inst[..., 9])
    zeros = jnp.zeros_like(ones)
    feat8 = jnp.where(
        rv, jnp.stack([inst[..., 6], inst[..., 7], inst[..., 8],
                       inst[..., 9], ones, zeros, zeros, zeros], -1), 0.0)
    data = jnp.swapaxes(jnp.concatenate([coeff8, feat8], -1), 1, 2)
    data = jnp.pad(data, ((0, 0), (0, 0), (0, epad - e)))
    return data, binning, packed


data, binning, packed = jax.block_until_ready(build(state))
print("built", flush=True)

gout = jnp.ones((batch, nt, 8, p), jnp.float32)


def loss_ct(d):
    out = composite_tiles(d, binning.starts, binning.counts, tile, chunk,
                          False)
    return jnp.sum(out * gout)


@jax.jit
def ct_fwd_k(data):
    carry = jnp.float32(0.0)
    for _ in range(K):
        d = data + carry * 1e-12
        out = composite_tiles(d, binning.starts, binning.counts, tile, chunk,
                              False)
        carry = jnp.sum(out[:, :, :5])
    return carry


@jax.jit
def ct_fb_k(data):
    carry = jnp.float32(0.0)
    for _ in range(K):
        d = data + carry * 1e-12
        g = jax.grad(loss_ct)(d)
        carry = jnp.sum(g[:, :, :100])
    return carry


def loss_gr(pk):
    inst = _gather_rows(pk, binning.gidx, n, INLINE, binning.inv_em,
                        binning.pool_ofs, binning.pool_len)
    return jnp.sum(inst * inst)


@jax.jit
def gr_fb_k(packed):
    carry = jnp.float32(0.0)
    for _ in range(K):
        pk = packed + carry * 1e-12
        g = jax.grad(loss_gr)(pk)
        carry = jnp.sum(g[:, :50])
    return carry


@jax.jit
def trivial(x):
    return jnp.sum(x[:, :, :4])


def timeit(f, *args, reps=4):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
t_rpc = timeit(trivial, data)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)
t = max(timeit(ct_fwd_k, data) - t_rpc, 1e-9) / K
print(f"[{time.time()-t0:.0f}s] composite fwd         {t*1e3:7.2f} ms",
      flush=True)
t = max(timeit(ct_fb_k, data) - t_rpc, 1e-9) / K
print(f"[{time.time()-t0:.0f}s] composite fwd+bwd     {t*1e3:7.2f} ms",
      flush=True)
t = max(timeit(gr_fb_k, packed) - t_rpc, 1e-9) / K
print(f"[{time.time()-t0:.0f}s] gather fwd+bwd(reduc) {t*1e3:7.2f} ms",
      flush=True)
