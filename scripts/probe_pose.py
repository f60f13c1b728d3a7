"""Cost of the in-jit OpenPose map rasterization (stage-1 step runs it
vmapped over the camera batch every step; reference draws with cv2 on host,
poser.py:832-904 — ours is pure-JAX inside the jit).
K-chained timing per NOTES gotcha 1."""
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

from gaussianip_tpu.human.posemap import openpose_draw

K = 8
h = w = 512
b = 4
rng = np.random.default_rng(0)
points3d = jnp.asarray(rng.normal(0, 0.3, (18, 3)).astype(np.float32))
mvp = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)))
az = jnp.asarray(np.linspace(0, 360, b).astype(np.float32))
hz = jnp.zeros((b,), bool)


@jax.jit
def f(pts):
    carry = jnp.float32(0.0)
    for _ in range(K):
        p2 = pts + carry * 1e-12
        imgs, vis, kps = jax.vmap(
            lambda m, a, z: openpose_draw(p2, m, a, z, h, w)
        )(mvp, az, hz)
        carry = jnp.sum(imgs) + jnp.sum(kps)
    return carry


@jax.jit
def trivial(pts):
    return jnp.sum(pts)


def timeit(fn, *args, reps=4):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
t_rpc = timeit(trivial, points3d)
t = max(timeit(f, points3d) - t_rpc, 1e-9) / K
print(f"[{time.time()-t0:.0f}s] posemap b{b} {h}^2  {t*1e3:7.2f} ms "
      f"(rpc {t_rpc*1e3:.0f})", flush=True)
