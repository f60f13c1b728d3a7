"""A/B gated render variants at 1024^2/100k on TPU: table_gather
(u16 default vs i32) and the supertile compositor factor (spt 1/2/4 —
SPT consecutive tiles per combined-window kernel pass). Full render fwd
and fwd+bwd, K-chained timing per NOTES gotcha 1.

Usage: probe_variants.py [tag ...]   tags from: base i32 spt2 spt4
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

eye = jnp.array([[1.8, 0.0, 0.2]])
c2w = look_at_c2w(eye, jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1]]))
cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
bg = jnp.zeros(3)
K = 3

VARIANTS = {
    "base": dict(),            # production defaults (u16 gather, chunk 128)
    # chunk A/B CLOSED (NOTES r5): 64 fails Mosaic (lane slices must be
    # 128-aligned); 256 measured 23.84 vs 22.47 ms fwd+bwd — 128 stays.
}


def make(cfg, grad):
    def loss(st, off):
        out = render(st, cams, bg, cfg, mean2d_offset=off)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)

    @jax.jit
    def f(st):
        carry = jnp.float32(0.0)
        off = jnp.zeros((1, n, 2))
        for _ in range(K):
            s2 = st.replace(xyz=st.xyz + carry * 1e-12)
            if grad:
                g = jax.grad(loss, argnums=(0, 1), allow_int=True)(s2, off)
                carry = jnp.sum(g[1]) + jnp.sum(g[0].xyz)
            else:
                carry = loss(s2, off)
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
t_rpc = timeit(trivial, state)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)
only = set(sys.argv[1:])
for tag, kw in VARIANTS.items():
    if only and tag not in only:
        continue
    cfg = RenderConfig(backend="pallas", **kw)
    for grad in (False, True):
        t = max(timeit(make(cfg, grad), state) - t_rpc, 1e-9) / K
        print(f"[{time.time()-t0:.0f}s] {tag:10s} grad={int(grad)}  "
              f"{t*1e3:7.2f} ms", flush=True)
