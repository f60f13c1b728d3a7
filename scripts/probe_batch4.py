"""Throughput at 1024^2/100k for camera batch 1 vs 4, and pool-size A/B.

Training (stage 3) renders batch 4 — per-camera overheads (small-op latency,
sort stage startup) may amortize in the batched vmap.
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

K = 3


def cams_for(batch):
    az = jnp.linspace(0, 2 * jnp.pi, batch, endpoint=False)
    eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                     jnp.full((batch,), 0.2)], -1)
    c2w = look_at_c2w(eye, jnp.zeros((batch, 3)),
                      jnp.tile(jnp.array([[0.0, 0, 1]]), (batch, 1)))
    return jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(
        c2w)


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
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)

for batch, pool in [(1, 0), (4, 0), (4, 512 * 1024)]:
    cams = cams_for(batch)
    cfg = RenderConfig(backend="pallas", pool=pool)

    def loss(st, off):
        out = render(st, cams, jnp.zeros(3), cfg, mean2d_offset=off)
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

    t = max(timeit(fb_k, state) - t_rpc, 1e-9) / K
    print(f"[{time.time()-t0:.0f}s] batch={batch} pool={pool or 'auto'}: "
          f"fwd+bwd {t*1e3:7.2f} ms total, {batch/t:6.2f} renders/s",
          flush=True)
