"""Finer splat-fwd breakdown: separate binning / gather+pack / compositor.

probe_r3_breakdown.py's 'full fwd minus proj+bin' lumps the wide attribute
gather, coefficient build, pack/transpose AND the pallas compositor into one
number; probe_tile32.py showed tile32 (half the live instances, 1/4 the
programs) does not move fwd time at all — so the compositor is likely NOT
the fwd bottleneck. Isolate it.
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
from gaussianip_tpu.render.composite_pallas import (composite_tiles,
                                                    tiles_to_image)
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

K = 4
tile, chunk, d_max = cfg.tile, cfg.chunk, cfg.d_max
ntx = nty = res // tile
pool = _auto_pool(n, chunk, res, res)
e = INLINE * n + pool
epad = (-(-(e + chunk) // chunk)) * chunk + chunk
print(f"pool={pool} e={e} epad={epad}", flush=True)


def pipeline(st, upto):
    """upto: 'bin' | 'gather' | 'pack' | 'full'"""
    xyz = st.xyz
    scales = st.get_scaling()
    opac = st.get_opacity()[:, 0]
    feats = st.get_features()
    active = st.active_mask()
    off = jnp.zeros((batch, n, 2))
    proj = jax.vmap(
        lambda cam, o: project_gaussians(
            xyz, scales, st.rotation, opac, feats, cam,
            st.active_sh_degree, 1.0, o, None, active))(cams, off)
    binning = jax.vmap(
        lambda m, r_, z_, v: bin_instances(
            m, r_, z_, v, tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
            d_max=d_max, pool=pool, chunk=chunk, with_inv=False,
        ))(proj.mean2d, proj.radius_bin, proj.depth, proj.valid)
    if upto == "bin":
        return (jnp.sum(binning.counts).astype(jnp.float32)
                + jnp.sum(binning.gidx[:, :8]).astype(jnp.float32))
    b = batch
    packed = jnp.concatenate(
        [proj.mean2d, proj.conic, (proj.opacity * jnp.ones((b, n)))[..., None],
         proj.color, proj.depth[..., None]], axis=-1)
    inst = _gather_rows(packed, binning.gidx, n, binning.inv_em,
                        binning.pool_ofs, binning.pool_len)
    if upto == "gather":
        return jnp.sum(inst[:, :, 0]) + jnp.sum(inst[:, :, 9])
    rv = (binning.gidx < n)[..., None]
    tile_safe = jnp.minimum(binning.tile_of, ntx * nty - 1)
    origin = jnp.stack(
        [(tile_safe % ntx) * tile, (tile_safe // ntx) * tile], axis=-1
    ).astype(jnp.float32)
    local = inst[..., 0:2] - origin
    coeff6 = gaussian_power_coeffs(local, inst[..., 2:5], inst[..., 5])
    coeff8 = jnp.where(
        rv, jnp.concatenate([coeff6, jnp.zeros_like(coeff6[..., :2])], -1), 0.0)
    ones = jnp.ones_like(inst[..., 9])
    zeros = jnp.zeros_like(ones)
    feat8 = jnp.where(
        rv,
        jnp.stack([inst[..., 6], inst[..., 7], inst[..., 8],
                   inst[..., 9], ones, zeros, zeros, zeros], -1), 0.0)
    data = jnp.swapaxes(jnp.concatenate([coeff8, feat8], axis=-1), 1, 2)
    data = jnp.pad(data, ((0, 0), (0, 0), (0, epad - e)))
    if upto == "pack":
        return jnp.sum(data[:, 0]) + jnp.sum(data[:, 9])
    out = composite_tiles(data, binning.starts, binning.counts, tile, chunk,
                          False)
    rgb, depth, alpha = tiles_to_image(out, nty, ntx, tile, res, res)
    return jnp.sum(rgb)


def stage_chain(upto):
    @jax.jit
    def f(state):
        carry = jnp.float32(0.0)
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            carry = pipeline(st, upto)
        return carry
    return f


@jax.jit
def trivial(state):
    return jnp.sum(state.opacity)


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
t_rpc = timeit(trivial, state)
print(f"[{time.time()-t0:.0f}s] rpc floor {t_rpc*1e3:.1f} ms", flush=True)
for upto in ["bin", "gather", "pack", "full"]:
    f = stage_chain(upto)
    t = max(timeit(f, state) - t_rpc, 1e-9) / K
    print(f"[{time.time()-t0:.0f}s] upto {upto:7s} {t*1e3:8.2f} ms",
          flush=True)
