"""A/B: gather-VJP mode (emission reduction vs XLA scatter-add) x tri
matmul precision (highest vs high) on the full 1024^2/100k fwd+bwd.
Also reports gradient agreement vs the baseline variant.
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

    def grad1(state):
        off = jnp.zeros((batch, n, 2))
        g = jax.grad(loss, argnums=(0, 1), allow_int=True)(state, off)
        return g[0].xyz, g[0].opacity, g[1]

    return fb_k, jax.jit(grad1)


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


def rel(a, b):
    d = np.abs(np.asarray(a) - np.asarray(b))
    s = np.maximum(np.abs(np.asarray(b)), 1e-6)
    return float(np.max(d / s)), float(np.quantile(d / s, 0.999))


t0 = time.time()
t_rpc = timeit(trivial, state)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)

ref_g = None
for vm in ("emission", "scatter"):
    for tri in ("highest", "split2"):
        cfg = RenderConfig(backend="pallas", vjp_mode=vm, tri=tri)
        fb_k, grad1 = make_fb(cfg)
        t = max(timeit(fb_k, state) - t_rpc, 1e-9) / K
        g = jax.device_get(grad1(state))
        if ref_g is None:
            ref_g = g
            agree = "(ref)"
        else:
            mx, q = rel(g[0], ref_g[0])
            agree = f"dxyz maxrel {mx:.2e} q999 {q:.2e}"
        print(f"[{time.time()-t0:.0f}s] vjp={vm:8s} tri={tri:7s}"
              f"  fwd+bwd {t*1e3:7.2f} ms  {agree}", flush=True)
