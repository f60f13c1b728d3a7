"""Attribution of the full stage-1 train step (558.5 ms in r4; target <450:
VERDICT r4 #7). Reference workload: one SDS/AHDS optimization step at
GaussianIP.py:360-457 (render 4x512^2 -> VAE encode -> UNet+CN ANPG ->
backprop to gaussians -> Adam + densify stats).

ALL variants run in one process (axon client init costs ~10 min/process);
module patches are applied before each make_train_step + first call (the
step traces then, picking up the patched globals) and restored after:
  full    the production jitted step (bench_pipeline stage-1 methodology)
  stubg   guidance -> differentiable pixel stub (render+posemap+adam+stats)
  nopose  openpose_draw -> zeros (full step minus the pose-map cost)
  noadam  adam_step -> near-identity (full step minus the optimizer update)
Combined with probe_gnab (VAE encode f+b, exact 4x512^2 shape) and
probe_unetglue (UNet+CN 12x64^2) this decomposes the step; the residual
is glue. 20 measured steps with per-step sync.
Usage: probe_stage1.py [variant ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import gaussianip_tpu.system.stage1 as S1
    from gaussianip_tpu.data.sampler import CameraSamplerConfig
    from gaussianip_tpu.diffusion.unet import (ControlNetModel,
                                               UNet2DConditionModel,
                                               UNetConfig)
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

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)

    ucfg = UNetConfig(lora_rank=128, ip_tokens=4, dtype=jnp.bfloat16)
    unet = UNet2DConditionModel(ucfg)
    cn = ControlNetModel(UNetConfig(dtype=jnp.bfloat16))
    vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16))
    lat0 = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
    t0_ = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, 81, 768), jnp.bfloat16)
    cimg0 = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    mk = lambda tree: jax.tree_util.tree_map(
        # f32 frozen params (the flax init default): bf16 params MEASURED ~25
        # ms/step SLOWER on the stage-1 step (444.8/448.1 f32 vs 467.2/471.2
        # bf16, r5) and f32 fits HBM in every stage next to the capped
        # attention budget (probe_refinemem) — production load_real_models
        # keeps f32 params for the same reason
        lambda sd: jnp.zeros(sd.shape, sd.dtype), tree)
    up = jax.device_put(mk(jax.eval_shape(unet.init, key, lat0, t0_, ctx0)),
                        dev)
    cp = jax.device_put(mk(jax.eval_shape(cn.init, key, lat0, t0_,
                                          ctx0[:, :77], cimg0)), dev)
    vp = jax.device_put(mk(jax.eval_shape(
        vae.init, key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))), dev)

    sk = Skeleton(_test_model=make_test_model(rng, n_verts=2000,
                                              n_faces=3000))
    sk.forward_smplx()
    sk.scale(-10)
    pts = sk.sample_smplx_points(100_000)
    gs = create_from_pcd(pts, np.full((100_000, 3), 0.5, np.float32),
                         1 << 17, mean_dist2_3nn(jnp.asarray(pts)))
    gs = jax.device_put(gs, dev)

    models = GuidanceModels(unet, up, cn, cp, vae, vp)
    pe = make_prompt_embeddings(fake_text_encoder(77, 768), "a person",
                                "bad quality", "")
    img = ImageEmbeds(pos=jnp.zeros((1, 4, 768)),
                      null=jnp.zeros((1, 4, 768)),
                      neg=jnp.zeros((1, 4, 768)))
    real_guidance = AHDSGuidance(models, pe, img, GuidanceConfig())

    class StubGuidance:
        jit_params = None

        def __call__(self, step, key, rgb, control, aux):
            return {"loss_sds": jnp.mean(rgb ** 2)
                    + 1e-20 * jnp.sum(control)}

    def _stub_draw(points3d, mvp, az, hz, h, w):
        # same output shapes/dtypes as the real one: canvas [H,W,3] f32,
        # all_vis scalar, kps2d [18,2]
        img = jnp.zeros((h, w, 3), jnp.float32) + 1e-20 * mvp[0, 0]
        return (img, jnp.float32(1.0),
                jnp.zeros((points3d.shape[0], 2), jnp.float32))

    def _id_adam(g, grads, opt, hyper, step):
        # consume the grads so nothing upstream is dead-code-eliminated
        eps = sum(jnp.sum(v) for v in grads.values()) * 1e-20
        return g.replace(xyz=g.xyz + eps), opt

    _orig_draw = S1.openpose_draw
    _orig_adam = S1.adam_step

    cfg = S1.Stage1Config()
    cam_cfg = CameraSamplerConfig(height=512, width=512, batch_size=4)

    def measure(tag, guidance):
        # fresh device copy: the jitted step DONATES the TrainState, whose
        # buffers alias gs — the previous variant's run deleted them
        gs_c = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if hasattr(x, "ndim") else x,  # incl 0-d
            gs)
        ts = S1.init_train_state(gs_c)
        step_fn = S1.make_train_step(cfg, cam_cfg, RenderConfig(d_max=16),
                                     AdamHyper(), guidance, sk.points3d)
        k = jax.random.PRNGKey(1)
        tc = time.time()
        ts1, m = step_fn(ts, k)
        float(m["loss"])
        print(f"[{time.time()-t0:.0f}s] {tag} compile {time.time()-tc:.0f}s",
              flush=True)
        for _ in range(8):
            k, kk = jax.random.split(k)
            ts1, m = step_fn(ts1, kk)
        float(m["loss"])
        nsteps = 20
        tc = time.time()
        for _ in range(nsteps):
            k, kk = jax.random.split(k)
            ts1, m = step_fn(ts1, kk)
            float(m["loss"])
        step_ms = (time.time() - tc) / nsteps * 1000
        print(f"[{time.time()-t0:.0f}s] stage1 {tag:7s} {step_ms:8.1f} "
              f"ms/step", flush=True)
        del ts1, step_fn

    t0 = time.time()
    only = set(sys.argv[1:])
    for tag in ("full", "stubg", "nopose", "noadam"):
        if only and tag not in only:
            continue
        guidance = real_guidance
        if tag == "stubg":
            guidance = StubGuidance()
        elif tag == "nopose":
            S1.openpose_draw = _stub_draw
        elif tag == "noadam":
            S1.adam_step = _id_adam
        try:
            measure(tag, guidance)
        finally:
            S1.openpose_draw = _orig_draw
            S1.adam_step = _orig_adam


if __name__ == "__main__":
    main()
