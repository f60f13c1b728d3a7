"""A/B: inline-tier size + pool sizing on the bench scene (1024^2/100k).

Stats first (footprint distribution -> extras per inline setting), then
fwd+bwd wall time per config. Sort/gather/reduction all scale with
E = inline*N + pool, so the smallest E that holds the live instances wins.
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
from gaussianip_tpu.render.preprocess import project_gaussians, tile_rect
from gaussianip_tpu.render.render import RenderConfig, render

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

c2w = look_at_c2w(jnp.array([[1.8, 0.0, 0.2]]), jnp.zeros((1, 3)),
                  jnp.array([[0.0, 0.0, 1.0]]))
cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
bg = jnp.zeros(3)

TILE, NT = 16, 64


@jax.jit
def footprint_counts(state):
    deg = state.active_sh_degree
    proj = jax.vmap(
        lambda cam, off: project_gaussians(
            state.xyz, state.get_scaling(), state.rotation,
            state.get_opacity()[:, 0], state.get_features(), cam, deg, 1.0,
            off, None, state.active_mask())
    )(cams, jnp.zeros((1, n, 2)))
    tx0, ty0, tx1, ty1 = tile_rect(
        proj.mean2d[0], proj.radius_bin[0], TILE, NT, NT)
    cnt = jnp.where(proj.valid[0], (tx1 - tx0) * (ty1 - ty0), 0)
    return jnp.minimum(cnt, 25)


cnt = np.asarray(footprint_counts(state))
live = int(cnt.sum())
print(f"valid {int((cnt > 0).sum())}, live instances {live}, "
      f"max footprint {cnt.max()}")
for k in (1, 2, 3, 4):
    extras = int(np.maximum(cnt - k, 0).sum())
    print(f"  inline={k}: inline slots {k*n}, extras {extras}, "
          f"E(pool=1.25x) {k*n + int(1.25*extras)}")

K = 3


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
print(f"rpc {t_rpc*1e3:.1f} ms", flush=True)

CH = 128


def rnd(x):
    return -(-x // CH) * CH


configs = [
    ("inline4/auto(base)", RenderConfig(backend="pallas")),
    ("inline2/pool-fit", RenderConfig(
        backend="pallas", inline=2,
        pool=rnd(int(1.25 * np.maximum(cnt - 2, 0).sum())))),
    ("inline1/pool-fit", RenderConfig(
        backend="pallas", inline=1,
        pool=rnd(int(1.25 * np.maximum(cnt - 1, 0).sum())))),
    ("inline2/pool-fit/dmax16", RenderConfig(
        backend="pallas", inline=2, d_max=16,
        pool=rnd(int(1.25 * np.maximum(cnt - 2, 0).sum())))),
]

for name, cfg in configs:
    def loss(st, off):
        out = render(st, cams, bg, cfg, mean2d_offset=off)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)

    @jax.jit
    def fb_k(state):
        carry = jnp.float32(0.0)
        off = jnp.zeros((1, n, 2))
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            g = jax.grad(loss, argnums=(0, 1), allow_int=True)(st, off)
            carry = jnp.sum(g[1]) + jnp.sum(g[0].xyz)
        return carry

    t = max(timeit(fb_k, state) - t_rpc, 1e-9) / K
    out = render(state, cams, bg, cfg)
    nd = int(out.n_dropped[0])
    print(f"{name:28s}: fwd+bwd {t*1e3:7.2f} ms, {1/t:6.2f} renders/s, "
          f"dropped {nd}", flush=True)
