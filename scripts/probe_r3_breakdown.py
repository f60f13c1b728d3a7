"""Round-3 splat-kernel breakdown at the headline shape (1024^2, 100k):
time each pipeline stage via in-graph K-chains (carry perturbs xyz so no
stage is hoisted; NOTES gotcha #8), subtracting the RPC floor."""
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
                                          _gather_rows, render)
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


def stage_chain(body):
    """body(state) -> scalar; chained K times perturbing xyz."""

    @jax.jit
    def f(state):
        carry = jnp.float32(0.0)
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            carry = body(st)
        return carry

    return f


def proj_of(st, ci=0):
    cam = jax.tree_util.tree_map(lambda a: a[ci] if hasattr(a, 'ndim')
                                 and a.ndim > 0 else a, cams)
    cam = cam._replace(height=cams.height, width=cams.width) if hasattr(
        cam, '_replace') else cam
    return project_gaussians(
        st.xyz, st.get_scaling(), st.rotation, st.get_opacity()[:, 0],
        st.get_features(), cam, st.active_sh_degree, 1.0,
        jnp.zeros((n, 2)), None, st.active_mask())


def body_proj(st):
    p = proj_of(st)
    return jnp.sum(p.mean2d) + jnp.sum(p.depth) + jnp.sum(p.color)


def body_bin(st):
    p = proj_of(st)
    b = bin_instances(p.mean2d, p.radius_bin, p.depth, p.valid, tile=tile,
                      n_tiles_x=ntx, n_tiles_y=nty, d_max=d_max, pool=pool,
                      chunk=chunk, with_inv=False)
    return jnp.sum(b.counts).astype(jnp.float32) + jnp.sum(b.gidx[:10])


def body_bin_inv(st):
    p = proj_of(st)
    b = bin_instances(p.mean2d, p.radius_bin, p.depth, p.valid, tile=tile,
                      n_tiles_x=ntx, n_tiles_y=nty, d_max=d_max, pool=pool,
                      chunk=chunk, with_inv=True)
    return (jnp.sum(b.counts).astype(jnp.float32) + jnp.sum(b.inv_em[:10])
            .astype(jnp.float32))


def body_fwd(st):
    out = render(st, cams, jnp.zeros(3), cfg)
    return jnp.sum(out.rgb)


def loss(st, off):
    out = render(st, cams, jnp.zeros(3), cfg, mean2d_offset=off)
    return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)


def body_fwdbwd(st):
    off = jnp.zeros((batch, n, 2))
    g = jax.grad(loss, argnums=(0, 1), allow_int=True)(st, off)
    return jnp.sum(g[1]) + jnp.sum(g[0].xyz)


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


t_rpc = timeit(trivial, state)
print(f"rpc floor {t_rpc*1e3:.1f} ms", flush=True)
for name, body in [("projection", body_proj), ("proj+bin", body_bin),
                   ("proj+bin+inv", body_bin_inv), ("full fwd", body_fwd),
                   ("full fwd+bwd", body_fwdbwd)]:
    f = stage_chain(body)
    t = max(timeit(f, state) - t_rpc, 1e-9) / K
    print(f"{name:16s} {t*1e3:8.2f} ms", flush=True)
