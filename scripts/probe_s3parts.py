"""Stage-3 step decomposition on TPU: where do the 944 ms/step go?

Times (a) the full step, (b) the step without LPIPS, (c) LPIPS alone
fwd+bwd at the crop shape, (d) the batch-4 1024^2 render fwd+bwd alone.
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

from gaussianip_tpu.data.sampler import refine_orbit_batch
from gaussianip_tpu.diffusion.lpips import LPIPS
from gaussianip_tpu.model.adam import AdamHyper
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig
from gaussianip_tpu.system.stage1 import init_train_state
from gaussianip_tpu.system.stage3 import Stage3Config, make_stage3_step
from gaussianip_tpu.utils.fast_init import fast_init

dev = jax.devices()[0]
rng = np.random.default_rng(0)
n = 100_000
z = rng.uniform(-0.85, 0.85, n)
th = rng.uniform(0, 2 * np.pi, n)
r = 0.25 * np.sqrt(np.maximum(0.0, 1 - (z / 0.9) ** 2)) + 0.03
pts = np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)
pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
d2 = mean_dist2_3nn(jnp.asarray(pts), block=4096)
gs = create_from_pcd(pts, cols, n, d2)
gs = gs.replace(
    opacity=jnp.asarray(rng.uniform(-1.0, 2.5, (n, 1)).astype(np.float32)))
ts = jax.device_put(init_train_state(gs), dev)

lp = LPIPS()
lparams = jax.device_put(
    fast_init(lp, jax.random.PRNGKey(0), jnp.zeros((1, 415, 290, 3)),
              jnp.zeros((1, 415, 290, 3))),
    dev)
lpips_fn = lambda x, y: lp.apply(lparams, x, y)

orbit = refine_orbit_batch(32, 0.0, 1.8, 40.0, 1024, 1024)
targets = jax.device_put(
    jnp.asarray(rng.uniform(0, 1, (32, 415, 290, 3)).astype(np.float32)), dev)
s3 = Stage3Config()


def timeit_scan(step, ts, reps=2, k=5):
    @jax.jit
    def run(ts):
        def body(ts, key):
            ts2, m = step(ts, key)
            return ts2, m["loss"]
        keys = jax.random.split(jax.random.PRNGKey(0), k)
        ts, losses = jax.lax.scan(body, ts, keys)
        return losses[-1]
    float(run(ts))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        float(run(ts))
        best = min(best, time.time() - t0)
    return best / k


@jax.jit
def trivial(ts):
    return jnp.sum(ts.gaussians.opacity)


def t_rpc():
    float(trivial(ts))
    t0 = time.time()
    float(trivial(ts))
    return time.time() - t0


rpc = t_rpc()
print(f"rpc {rpc*1e3:.1f} ms", flush=True)

t0 = time.time()
full = make_stage3_step(s3, RenderConfig(), AdamHyper(), orbit, targets,
                        lpips_fn)
t = timeit_scan(full, ts) - rpc / 5
print(f"[{time.time()-t0:.0f}s] full step: {t*1e3:.1f} ms", flush=True)

nolp = make_stage3_step(s3, RenderConfig(), AdamHyper(), orbit, targets, None)
t = timeit_scan(nolp, ts) - rpc / 5
print(f"[{time.time()-t0:.0f}s] step w/o lpips: {t*1e3:.1f} ms", flush=True)

# lpips alone, fwd+bwd at the crop shape
x = jax.device_put(
    jnp.asarray(rng.uniform(0, 1, (4, 415, 290, 3)).astype(np.float32)), dev)
y = jax.device_put(
    jnp.asarray(rng.uniform(0, 1, (4, 415, 290, 3)).astype(np.float32)), dev)


@jax.jit
def lp_fb(x):
    def body(c, _):
        g = jax.grad(lambda a: jnp.sum(lpips_fn(a, y)))(x + c * 1e-12)
        return jnp.sum(g), None
    c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=5)
    return c


float(lp_fb(x))
t0l = time.time()
float(lp_fb(x))
print(f"[{time.time()-t0:.0f}s] lpips fwd+bwd alone: "
      f"{(time.time()-t0l-rpc)/5*1e3:.1f} ms", flush=True)
