"""In-context truncated A/B of the attribute-gather VJP modes: pipeline =
proj -> binning -> gather -> sum(inst^2), fwd and fwd+bwd, on the bench
scene (1024^2/100k). Isolates where the emission-mode end-to-end regression
(25.56 vs 23.7 ms, r4) comes from: binning-side inv/em overhead (fwd rows)
vs the backward reduction itself (grad rows)."""
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
from gaussianip_tpu.render.preprocess import project_gaussians
from gaussianip_tpu.render.render import (RenderConfig, _auto_pool,
                                          _gather_rows)

rng = np.random.default_rng(0)
n = 100_000
res = 1024
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

eye = jnp.array([[1.8, 0.0, 0.2]])
c2w = look_at_c2w(eye, jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1.0]]))
cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
cfg = RenderConfig(backend="pallas")
tile, ntx, nty = cfg.tile, res // cfg.tile, res // cfg.tile
pool = _auto_pool(n, cfg.chunk, res, res, cfg.inline, cfg.tile, cfg.d_max)
K = 25
t0 = time.time()


def mark(s):
    print(f"[{time.time()-t0:5.0f}s] {s}", file=sys.stderr, flush=True)


def upto_gather(st, mode):
    deg = st.active_sh_degree
    proj = jax.vmap(
        lambda cam, o: project_gaussians(
            st.xyz, st.get_scaling(), st.rotation, st.get_opacity()[:, 0],
            st.get_features(), cam, deg, 1.0, o, None, st.active_mask())
    )(cams, jnp.zeros((1, n, 2), jnp.float32))
    emission = mode == "emission"
    b = bin_instances(
        proj.mean2d[0], proj.radius_bin[0], proj.depth[0], proj.valid[0],
        proj.radius_cull[0], tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
        d_max=cfg.d_max, pool=pool, chunk=cfg.chunk, with_inv=emission,
        inline=cfg.inline, inv_mode=cfg.inv_mode,
        carry_gid=cfg.carry_gid and not emission, depth_key=cfg.depth_key,
        sort_stable=cfg.sort_stable, ownership=cfg.ownership,
        tile_cull=cfg.tile_cull)
    packed = jnp.concatenate(
        [proj.mean2d[0], proj.conic[0],
         (proj.opacity[0] * jnp.ones((n,)))[..., None], proj.color[0],
         proj.depth[0][..., None]], axis=-1)
    if mode == "scatter":
        inst = jnp.take_along_axis(
            packed, jnp.minimum(b.gidx, n - 1)[:, None], axis=0)
        inst = jnp.where((b.gidx < n)[:, None], inst, 0.0)
    else:
        inst = _gather_rows(packed, b.gidx, n, cfg.inline, b.inv_em,
                            b.pool_ofs, b.pool_len)
    return jnp.sum(inst * inst)


def timed(mode, grad, reps=3):
    def one(st):
        return upto_gather(st, mode)

    @jax.jit
    def chain(st):
        carry = jnp.float32(0.0)
        for _ in range(K):
            s2 = st.replace(xyz=st.xyz + carry * 1e-12)
            if grad:
                v, g = jax.value_and_grad(one, allow_int=True)(s2)
                carry = v * 1e-12 + jnp.sum(g.xyz)
            else:
                carry = one(s2)
        return carry

    float(chain(state))
    ts = []
    for _ in range(reps):
        s = time.time()
        float(chain(state))
        ts.append(time.time() - s)
    return min(ts) / K * 1000


@jax.jit
def trivial(st):
    return jnp.sum(st.opacity)


float(trivial(state))
s = time.time()
float(trivial(state))
rpc = (time.time() - s) * 1000

which = sys.argv[1:] or ["scatter", "emission"]
for mode in which:
    f0 = timed(mode, False)
    mark(f"{mode:9s} fwd  {f0 - rpc/K:7.2f} ms")
    f1 = timed(mode, True)
    mark(f"{mode:9s} f+b  {f1 - rpc/K:7.2f} ms")
