"""Full AHDS-guidance stage-1 step in the proven-fast measurement pattern."""
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
from gaussianip_tpu.diffusion.unet import (ControlNetModel,
                                           UNet2DConditionModel, UNetConfig)
from gaussianip_tpu.diffusion.vae import AutoencoderKL, VAEConfig
from gaussianip_tpu.guidance.ipa import (AHDSGuidance, GuidanceConfig,
                                         GuidanceModels, ImageEmbeds)
from gaussianip_tpu.guidance.prompts import (fake_text_encoder,
                                             make_prompt_embeddings)
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
key = jax.random.PRNGKey(0)

sk = Skeleton(_test_model=make_test_model(rng, n_verts=2000, n_faces=3000))
sk.forward_smplx()
sk.scale(-10)
pts = sk.sample_smplx_points(100_000)
gs = jax.device_put(create_from_pcd(
    pts, np.full((100_000, 3), 0.5, np.float32), 1 << 17,
    mean_dist2_3nn(jnp.asarray(pts))), dev)
ts0_host = jax.device_get(init_train_state(gs))

t0 = time.time()
ucfg = UNetConfig(lora_rank=128, ip_tokens=4, dtype=jnp.bfloat16)
unet = UNet2DConditionModel(ucfg)
cn = ControlNetModel(UNetConfig(dtype=jnp.bfloat16))
vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16))
lat0 = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
t0_ = jnp.zeros((1,), jnp.int32)
ctx0 = jnp.zeros((1, 81, 768), jnp.bfloat16)
cimg0 = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
mk = lambda shapes: jax.tree_util.tree_map(
    lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
up = jax.device_put(mk(jax.eval_shape(unet.init, key, lat0, t0_, ctx0)), dev)
cp = jax.device_put(mk(jax.eval_shape(cn.init, key, lat0, t0_, ctx0[:, :77],
                                      cimg0)), dev)
vp = jax.device_put(mk(jax.eval_shape(
    vae.init, key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))), dev)
print(f"param alloc {time.time()-t0:.0f}s", flush=True)

models = GuidanceModels(unet, up, cn, cp, vae, vp)
pe = make_prompt_embeddings(fake_text_encoder(77, 768), "a person",
                            "bad quality", "")
img = ImageEmbeds(pos=jnp.zeros((1, 4, 768)), null=jnp.zeros((1, 4, 768)),
                  neg=jnp.zeros((1, 4, 768)))
guidance = AHDSGuidance(models, pe, img, GuidanceConfig())

cfg = Stage1Config()
cam_cfg = CameraSamplerConfig(height=512, width=512, batch_size=4)
step_fn = make_train_step(cfg, cam_cfg, RenderConfig(d_max=16), AdamHyper(),
                          guidance, sk.points3d)

ts = jax.device_put(ts0_host, dev)
k = jax.random.PRNGKey(1)
t0 = time.time()
ts, m = step_fn(ts, k)
float(m["loss"])
print(f"full step: compile {time.time()-t0:.0f}s", flush=True)
for n in (6, 6):
    t0 = time.time()
    for _ in range(n):
        k, kk = jax.random.split(k)
        ts, m = step_fn(ts, kk)
    float(m["loss"])
    print(f"full step: {(time.time()-t0)/n*1000:.0f} ms/step", flush=True)
