"""A/B: full render fwd+bwd at 1024^2/100k across binning variants.

Variants: carry_gid on/off (3- vs 2-payload sort + post-sort gid gather),
pool_mode scan/search (mark-scatter+cumsum vs searchsorted ownership).
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
from gaussianip_tpu.render.render import RenderConfig, render

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
K = 3


def make_fb(cfg):
    def loss(st, off):
        out = render(st, cams, bg, cfg, mean2d_offset=off)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)

    @jax.jit
    def fb_k(state):
        carry = jnp.float32(0.0)
        off = jnp.zeros((batch, n, 2))
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            g = jax.grad(loss, argnums=(0, 1), allow_int=True)(st, off)
            carry = jnp.sum(g[1]) + jnp.sum(g[0].xyz)
        return carry

    return fb_k


@jax.jit
def trivial(state):
    return jnp.sum(state.opacity)


def timeit(f, *args, reps=4):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
t_rpc = timeit(trivial, state)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)
# r3 measured: carry_gid=1 scan 36.38 | carry_gid=1 search 76.12 |
# carry_gid=0 scan 39.75 | carry_gid=0 search 81.28 ms -> keep the 3-payload
# sort + scan ownership (searchsorted lowers to a gather loop; the post-sort
# 450k gid gather costs more than the third sort operand)
for cg in (True, False):
    cfg = RenderConfig(backend="pallas", carry_gid=cg)
    t = max(timeit(make_fb(cfg), state) - t_rpc, 1e-9) / K
    print(f"[{time.time()-t0:.0f}s] carry_gid={int(cg)}"
          f"  fwd+bwd {t*1e3:7.2f} ms", flush=True)
