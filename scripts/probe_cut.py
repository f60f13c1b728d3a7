"""Stage-cut decomposition of the splat fwd+bwd at 1024^2/100k: time the
pipeline truncated after each stage (proj / binning / gather+pack / fwd
compositor / full grad) to attribute the wall-clock. K-chained timing per
NOTES (axon tunnel: block_until_ready does not block)."""
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
from gaussianip_tpu.render.binning import bin_instances
from gaussianip_tpu.render.composite_pallas import (composite_tiles,
                                                    tiles_to_image)
from gaussianip_tpu.render.preprocess import (gaussian_power_coeffs,
                                              project_gaussians)
from gaussianip_tpu.render.render import RenderConfig, _auto_pool, render

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
bg = jnp.zeros(3)
cfg = RenderConfig(backend="pallas")
# K must be large enough that K*stage_time >> the tunnel RPC floor
# (a first attempt at K=3 was swamped: floor ~100 ms that window)
K = 25

h = w = res
tile = cfg.tile
ntx = nty = -(-res // tile)
pool = _auto_pool(n, cfg.chunk, h, w, cfg.inline, cfg.tile, cfg.d_max)
e = cfg.inline * n + pool
epad = (-(-(e + cfg.chunk) // cfg.chunk)) * cfg.chunk + cfg.chunk


def upto_fn(st, upto):
    """Truncated render; returns a scalar that depends on everything up to
    `upto`."""
    deg = st.active_sh_degree
    xyz = st.xyz
    scales = st.get_scaling()
    opac = st.get_opacity()[:, 0]
    feats = st.get_features()
    active = st.active_mask()
    off = jnp.zeros((batch, n, 2), jnp.float32)
    proj = jax.vmap(
        lambda cam, o: project_gaussians(
            xyz, scales, st.rotation, opac, feats, cam, deg, 1.0, o, None,
            active)
    )(cams, off)
    if upto == "proj":
        return (jnp.sum(proj.mean2d) + jnp.sum(proj.conic)
                + jnp.sum(proj.color) + jnp.sum(proj.depth)
                + jnp.sum(proj.radius_bin))
    per_cam = [
        bin_instances(
            proj.mean2d[i], proj.radius_bin[i], proj.depth[i],
            proj.valid[i], proj.radius_cull[i],
            tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
            d_max=cfg.d_max, pool=pool, chunk=cfg.chunk,
            inline=cfg.inline,
            carry_gid=cfg.carry_gid, depth_key=cfg.depth_key,
            sort_stable=cfg.sort_stable,
            tile_cull=cfg.tile_cull)
        for i in range(batch)
    ]
    binning = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_cam)
    if upto == "binning":
        return (jnp.sum(binning.gidx) + jnp.sum(binning.counts)
                + jnp.sum(proj.mean2d)).astype(jnp.float32)
    packed = jnp.concatenate(
        [proj.mean2d, proj.conic,
         (proj.opacity * jnp.ones((batch, n)))[..., None], proj.color,
         proj.depth[..., None]], axis=-1)
    gidx_safe = jnp.minimum(binning.gidx, n - 1)
    inst = jnp.stack([
        jnp.take_along_axis(packed[i], gidx_safe[i][:, None], axis=0)
        for i in range(batch)
    ])
    inst = jnp.where((binning.gidx < n)[..., None], inst, 0.0)
    if upto == "gather":
        return jnp.sum(inst * inst)
    rv = (binning.gidx < n)[..., None]
    tile_safe = jnp.minimum(binning.tile_of, ntx * nty - 1)
    origin = jnp.stack(
        [(tile_safe % ntx) * tile, (tile_safe // ntx) * tile],
        axis=-1).astype(jnp.float32)
    local = inst[..., 0:2] - origin
    coeff6 = gaussian_power_coeffs(local, inst[..., 2:5], inst[..., 5])
    coeff8 = jnp.where(
        rv, jnp.concatenate([coeff6, jnp.zeros_like(coeff6[..., :2])], -1),
        0.0)
    ones = jnp.ones_like(inst[..., 9])
    zeros = jnp.zeros_like(ones)
    feat8 = jnp.where(
        rv,
        jnp.stack([inst[..., 6], inst[..., 7], inst[..., 8], inst[..., 9],
                   ones, zeros, zeros, zeros], -1), 0.0)
    data = jnp.swapaxes(jnp.concatenate([coeff8, feat8], -1), 1, 2)
    data = jnp.pad(data, ((0, 0), (0, 0), (0, epad - e)))
    if upto == "pack":
        return jnp.sum(data * data)
    out = composite_tiles(data, binning.starts, binning.counts, tile,
                          cfg.chunk, False, cfg.tri)
    rgb, depth, alpha = tiles_to_image(out, nty, ntx, tile, h, w)
    return jnp.sum(rgb ** 2) + jnp.sum(alpha) + jnp.sum(depth)


def make(upto, grad):
    def one(st):
        return upto_fn(st, upto)

    @jax.jit
    def f(st):
        carry = jnp.float32(0.0)
        for _ in range(K):
            s2 = st.replace(xyz=st.xyz + carry * 1e-12)
            if grad:
                v, g = jax.value_and_grad(one, allow_int=True)(s2)
                carry = v + jnp.sum(g.xyz)
            else:
                carry = one(s2)
        return carry

    return f


@jax.jit
def trivial(st):
    return jnp.sum(st.opacity)


def timeit(f, *args, reps=4):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()

rows = [("proj", False), ("proj", True), ("binning", False),
        ("gather", False), ("gather", True),
        ("pack", False), ("pack", True), ("full", False), ("full", True)]
if len(sys.argv) > 1:
    rows = [r for r in rows if r[0] in sys.argv[1:]]
for upto, grad in rows:
    f = make(upto, grad)
    t_rpc = timeit(trivial, state)  # re-measure the floor per row: it drifts
    t = max(timeit(f, state) - t_rpc, 1e-9) / K
    print(f"[{time.time()-t0:.0f}s] upto={upto:8s} grad={int(grad)}"
          f"  {t*1e3:7.2f} ms  (rpc {t_rpc*1e3:.0f})", flush=True)
