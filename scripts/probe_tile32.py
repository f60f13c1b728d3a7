"""tile=32 vs tile=16 (v2 kernel): numerics + speed at 1024^2/100k."""
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
from gaussianip_tpu.render.render import (RenderConfig, count_live_instances,
                                          render)

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

cfg16 = RenderConfig(backend="pallas")
# 3x3 32-px window spans 96 px >= the 5x5 16-px window's 80 px
cfg32 = RenderConfig(backend="pallas", tile=32, d_max=9)

import time as _t

t0 = _t.time()
nl16 = int(jax.device_get(count_live_instances(state, cams, cfg16))[0])
print(f"[{_t.time()-t0:.0f}s] live tile16 {nl16}", flush=True)
nl32 = int(jax.device_get(count_live_instances(state, cams, cfg32))[0])
print(f"[{_t.time()-t0:.0f}s] live tile32 {nl32}", flush=True)

out16 = render(state, cams, jnp.zeros(3), cfg16)
print(f"[{_t.time()-t0:.0f}s] render16 done", flush=True)
out32 = render(state, cams, jnp.zeros(3), cfg32)
print(f"[{_t.time()-t0:.0f}s] render32 done", flush=True)
d = np.abs(np.asarray(out16.rgb) - np.asarray(out32.rgb))
print(f"rgb diff q99 {np.quantile(d, 0.99):.2e} max {d.max():.2e} "
      f"dropped16={int(out16.n_dropped[0])} dropped32={int(out32.n_dropped[0])}",
      flush=True)

K = 3  # matches bench.py's chain length -> tile16 graphs hit the compile cache


def loss(st, off, cfg):
    out = render(st, cams, jnp.zeros(3), cfg, mean2d_offset=off)
    return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)


def chains(cfg):
    @jax.jit
    def fwd_k(state):
        carry = jnp.float32(0.0)
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            out = render(st, cams, jnp.zeros(3), cfg)
            carry = jnp.sum(out.rgb)
        return carry

    @jax.jit
    def fb_k(state):
        carry = jnp.float32(0.0)
        off = jnp.zeros((batch, n, 2))
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            g = jax.grad(loss, argnums=(0, 1), allow_int=True)(st, off, cfg)
            carry = jnp.sum(g[1]) + jnp.sum(g[0].xyz)
        return carry

    return fwd_k, fb_k


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
print(f"[{_t.time()-t0:.0f}s] rpc floor {t_rpc*1e3:.1f} ms", flush=True)
for name, cfg in [("tile16", cfg16), ("tile32", cfg32)]:
    fwd_k, fb_k = chains(cfg)
    tf = max(timeit(fwd_k, state) - t_rpc, 1e-9) / K
    print(f"[{_t.time()-t0:.0f}s] {name}: fwd {tf*1e3:6.2f} ms", flush=True)
    tb = max(timeit(fb_k, state) - t_rpc, 1e-9) / K
    print(f"[{_t.time()-t0:.0f}s] {name}: fwd+bwd {tb*1e3:6.2f} ms",
          flush=True)
