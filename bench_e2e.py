"""End-to-end stage-1 training-step benchmark at the paper recipe shape:
100k gaussians, 512^2 renders, camera batch 4, full-size (zero-weight) SD1.5
+ ControlNet + IPA guidance with the ANPG 3-way CFG batch, pose-map
rasterization, viewspace stats and Adam — the whole jitted step.

Not run by the driver (bench.py is); use to estimate avatar wall-clock:
stage1 = 2400 * step_ms. Prints one JSON line."""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussianip_tpu.data.sampler import CameraSamplerConfig
    from gaussianip_tpu.diffusion.unet import (
        ControlNetModel, UNet2DConditionModel, UNetConfig)
    from gaussianip_tpu.diffusion.vae import AutoencoderKL, VAEConfig
    from gaussianip_tpu.guidance.ipa import (
        AHDSGuidance, GuidanceConfig, GuidanceModels, ImageEmbeds)
    from gaussianip_tpu.guidance.prompts import (
        fake_text_encoder, make_prompt_embeddings)
    from gaussianip_tpu.human.skeleton import Skeleton
    from gaussianip_tpu.human.smplx_jax import make_test_model
    from gaussianip_tpu.model.adam import AdamHyper
    from gaussianip_tpu.model.gaussians import create_from_pcd
    from gaussianip_tpu.ops.knn import mean_dist2_3nn
    from gaussianip_tpu.render.render import RenderConfig
    from gaussianip_tpu.system.stage1 import init_train_state, make_train_step

    rng = np.random.default_rng(0)
    tpu = jax.devices()[0]

    # full-size diffusion stack, zero weights on device (throughput only)
    ucfg = UNetConfig(lora_rank=128, ip_tokens=4, dtype=jnp.bfloat16)
    unet = UNet2DConditionModel(ucfg)
    cn = ControlNetModel(UNetConfig(dtype=jnp.bfloat16))
    vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    lat0 = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
    t0_ = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, 81, 768), jnp.bfloat16)
    cimg0 = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    mk = lambda shapes: jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
    up = mk(jax.eval_shape(unet.init, key, lat0, t0_, ctx0))
    cp = mk(jax.eval_shape(cn.init, key, lat0, t0_, ctx0[:, :77], cimg0))
    vp = mk(jax.eval_shape(vae.init, key, jnp.zeros((1, 64, 64, 3),
                                                    jnp.bfloat16)))
    models = GuidanceModels(unet, up, cn, cp, vae, vp)
    pe = make_prompt_embeddings(fake_text_encoder(77, 768), "a person",
                                "bad quality", "")
    img = ImageEmbeds(pos=jnp.zeros((1, 4, 768)), null=jnp.zeros((1, 4, 768)),
                      neg=jnp.zeros((1, 4, 768)))
    guidance = AHDSGuidance(models, pe, img, GuidanceConfig())

    # avatar scene at recipe scale
    sk = Skeleton(_test_model=make_test_model(rng, n_verts=2000, n_faces=3000))
    sk.forward_smplx()
    sk.scale(-10)
    pts = sk.sample_smplx_points(100_000)
    gs = create_from_pcd(pts, np.full((100_000, 3), 0.5, np.float32),
                         1 << 17, mean_dist2_3nn(jnp.asarray(pts)))
    ts = init_train_state(gs)

    from gaussianip_tpu.system.stage1 import Stage1Config

    cfg = Stage1Config()
    cam_cfg = CameraSamplerConfig(height=512, width=512, batch_size=4)
    step_fn = make_train_step(cfg, cam_cfg, RenderConfig(), AdamHyper(),
                              guidance, sk.points3d)

    k = jax.random.PRNGKey(1)
    t0 = time.time()
    ts, m = step_fn(ts, k)
    float(m["loss"])
    compile_s = time.time() - t0
    reps = 5
    times = []
    for i in range(reps):
        k, kk = jax.random.split(k)
        t0 = time.time()
        ts, m = step_fn(ts, kk)
        float(m["loss"])
        times.append(time.time() - t0)
    step_ms = min(times) * 1000
    print(json.dumps({
        "stage1_step_ms": round(step_ms, 1),
        "stage1_2400_steps_min": round(step_ms * 2400 / 60000, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
