"""A/B: tile_cull x chunk on the bench scene (1024^2/100k), fwd and fwd+bwd.
K-chained timing per NOTES gotcha 1 (xyz perturbation feeds every stage)."""
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
c2w = look_at_c2w(eye, jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1]]))
cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
bg = jnp.zeros(3)
K = 8


def bench(cfg, label):
    t_all = time.time()

    def loss(st, off):
        out = render(st, cams, bg, cfg, mean2d_offset=off)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)

    @jax.jit
    def fwd_k(state):
        carry = jnp.float32(0.0)
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            out = render(st, cams, bg, cfg)
            carry = jnp.sum(out.rgb)
        return carry

    @jax.jit
    def fb_k(state):
        carry = jnp.float32(0.0)
        off = jnp.zeros((1, n, 2))
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            g = jax.grad(loss, argnums=(0, 1), allow_int=True)(st, off)
            carry = jnp.sum(g[1]) + jnp.sum(g[0].xyz)
        return carry

    @jax.jit
    def trivial(state):
        return jnp.sum(state.opacity)

    def timeit(f, *a, reps=3):
        float(f(*a))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        return min(ts)

    t_rpc = timeit(trivial, state)
    t_f = max(timeit(fwd_k, state) - t_rpc, 1e-9) / K
    t_fb = max(timeit(fb_k, state) - t_rpc, 1e-9) / K
    nl = int(np.asarray(count_live_instances(state, cams, cfg))[0])
    print(f"[{time.time()-t_all:5.0f}s] {label:28s} fwd {t_f*1e3:6.2f}  "
          f"fwd+bwd {t_fb*1e3:6.2f} ms  live {nl}", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
cases = {
    "base": (RenderConfig(backend="pallas", tile_cull=False), "cull=0 c128"),
    "cull": (RenderConfig(backend="pallas"), "cull=1 c128"),
    "cull256": (RenderConfig(backend="pallas", chunk=256), "cull=1 c256"),
    "base256": (RenderConfig(backend="pallas", tile_cull=False, chunk=256),
                "cull=0 c256"),
}
for k, (cfg, label) in cases.items():
    if which in ("all", k):
        bench(cfg, label)
