"""A/B: inline step body (260ms) vs make_train_step (reported 12.9s) with
identical configs, same process."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianip_tpu.data.sampler import CameraSamplerConfig
from gaussianip_tpu.guidance.stub import make_stub_guidance
from gaussianip_tpu.human.skeleton import Skeleton
from gaussianip_tpu.human.smplx_jax import make_test_model
from gaussianip_tpu.model.adam import AdamHyper
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig
from gaussianip_tpu.system.stage1 import (Stage1Config, init_train_state,
                                          make_train_step)

rng = np.random.default_rng(0)
dev = jax.devices()[0]
sk = Skeleton(_test_model=make_test_model(rng, n_verts=2000, n_faces=3000))
sk.forward_smplx()
sk.scale(-10)
pts = sk.sample_smplx_points(100_000)
gs = jax.device_put(create_from_pcd(
    pts, np.full((100_000, 3), 0.5, np.float32), 1 << 17,
    mean_dist2_3nn(jnp.asarray(pts))), dev)
ts0_host = jax.device_get(init_train_state(gs))

cfg = Stage1Config()
print("cfg render:", cfg.render_height, cfg.render_width, flush=True)
cam_cfg = CameraSamplerConfig(height=512, width=512, batch_size=4)
guidance = make_stub_guidance(target_rgb=jnp.zeros((64, 64, 3)),
                              noise_scale=0.01)
step_fn = make_train_step(cfg, cam_cfg, RenderConfig(d_max=16), AdamHyper(),
                          guidance, sk.points3d)

ts = jax.device_put(ts0_host, dev)
k = jax.random.PRNGKey(0)
t0 = time.time()
ts, m = step_fn(ts, k)
float(m["loss"])
print(f"make_train_step stub: compile {time.time()-t0:.0f}s", flush=True)
for n in (6, 6):
    t0 = time.time()
    for _ in range(n):
        k, kk = jax.random.split(k)
        ts, m = step_fn(ts, kk)
    float(m["loss"])
    print(f"make_train_step stub: {(time.time()-t0)/n*1000:.0f} ms/step",
          flush=True)

# memory-pressure probe: allocate ~2.6GB of dummy arrays and re-measure
dummies = [jax.device_put(jnp.zeros((1024, 1024, 320), jnp.bfloat16), dev)
           for _ in range(4)]
jax.block_until_ready(dummies)
print("dummy 2.6GB resident", flush=True)
t0 = time.time()
for _ in range(6):
    k, kk = jax.random.split(k)
    ts, m = step_fn(ts, kk)
float(m["loss"])
print(f"stub step with 2.6GB resident: {(time.time()-t0)/6*1000:.0f} ms/step",
      flush=True)

# handle-count probe: ~1200 small arrays resident
small = [jax.device_put(jnp.zeros((64, 64), jnp.bfloat16), dev)
         for _ in range(1200)]
jax.block_until_ready(small)
print("1200 small arrays resident", flush=True)
t0 = time.time()
for _ in range(6):
    k, kk = jax.random.split(k)
    ts, m = step_fn(ts, kk)
float(m["loss"])
print(f"stub step with 1200 handles: {(time.time()-t0)/6*1000:.0f} ms/step",
      flush=True)
