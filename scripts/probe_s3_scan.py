"""Bisect the stage-3 scan fault: small scene, varying scan chunk sizes."""
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

from gaussianip_tpu.data.sampler import refine_orbit_batch
from gaussianip_tpu.model.adam import AdamHyper
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig
from gaussianip_tpu.system.stage1 import init_train_state
from gaussianip_tpu.system.stage3 import Stage3Config, train_stage3

size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
log_every = int(sys.argv[2]) if len(sys.argv) > 2 else 20
n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 60

rng = np.random.default_rng(0)
dev = jax.devices()[0]
n = 20_000
pts = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
gs = jax.device_put(create_from_pcd(
    pts, np.full((n, 3), 0.5, np.float32), 1 << 15,
    mean_dist2_3nn(jnp.asarray(pts))), dev)
ts = init_train_state(gs)

orbit = refine_orbit_batch(32, 0.0, 1.8, 40.0, size, size)
ch, cw = size * 830 // 2048, size * 580 // 2048
refined = jax.device_put(jnp.asarray(
    rng.uniform(0, 1, (32, ch, cw, 3)).astype(np.float32)), dev)
cy = (60 * size // 1024, 60 * size // 1024 + 2 * ch)
cx = (220 * size // 1024, 220 * size // 1024 + 2 * cw)
s3 = Stage3Config(height=size, width=size, crop_y=cy, crop_x=cx,
                  refine_start_step=2400, max_steps=n_steps)

t0 = time.time()
ts = train_stage3(ts, s3, RenderConfig(), AdamHyper(), orbit, refined,
                  jax.random.PRNGKey(11), log_every=log_every,
                  log_fn=lambda i, m: print(f"step {i}: {m['loss']:.4f}",
                                            flush=True))
jax.block_until_ready(ts.gaussians.xyz)
print(f"OK {n_steps} steps size={size} log_every={log_every}: "
      f"{time.time()-t0:.1f}s", flush=True)
