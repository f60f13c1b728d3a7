"""Compile-only HBM accounting of the stage-2 refine phases (no execution
— the r5 runs RESOURCE_EXHAUSTED the 16 GB chip, so measure peak memory
from XLA's own analysis before burning another 45-min pipeline run).

For each phase executable (store / key / dense) at production shapes
(32 views @1024^2 -> 128^2 latents, CFG batch 8) and for the VAE
encode/decode sweeps, prints argument/output/temp sizes. Runs the phase
set twice: GIP_ATTN_SCORE_BYTES=2e9 (chunked 64^2 attention — the r5 fix)
vs 7e9 (the old threshold) to quantify the unchunked-score transient.

Reference workload: threestudio/models/guidance/refine.py:115-239.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianip_tpu.diffusion.scheduler import make_ddim_schedule
from gaussianip_tpu.diffusion.unet import (ControlNetModel,
                                           UNet2DConditionModel, UNetConfig)
from gaussianip_tpu.diffusion.vae import AutoencoderKL, VAEConfig
from gaussianip_tpu.system.refine import RefineModels, make_refine_step

GB = 1 << 30
key = jax.random.PRNGKey(0)
mk = lambda tree: jax.tree_util.tree_map(
    # f32 frozen params (the flax init default): bf16 params MEASURED ~25
    # ms/step SLOWER on the stage-1 step (444.8/448.1 f32 vs 467.2/471.2
    # bf16, r5) and f32 fits HBM in every stage next to the capped
    # attention budget (probe_refinemem) — production load_real_models
    # keeps f32 params for the same reason
    lambda sd: jnp.zeros(sd.shape, sd.dtype), tree)

ucfg = UNetConfig(lora_rank=128, ip_tokens=4, dtype=jnp.bfloat16)
unet = UNet2DConditionModel(ucfg)
cn = ControlNetModel(UNetConfig(dtype=jnp.bfloat16))
vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16))
lat0 = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
t0_ = jnp.zeros((1,), jnp.int32)
ctx0 = jnp.zeros((1, 81, 768), jnp.bfloat16)
cimg0 = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
up = mk(jax.eval_shape(unet.init, key, lat0, t0_, ctx0))
cp = mk(jax.eval_shape(cn.init, key, lat0, t0_, ctx0[:, :77], cimg0))
vp = mk(jax.eval_shape(
    vae.init, key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16)))
rm = RefineModels(unet, up, cn, cp, vae, vp)
ddim = make_ddim_schedule()

lat_full = jnp.zeros((32, 128, 128, 4), jnp.float32)
ctx8 = jnp.zeros((8, 81, 768), jnp.bfloat16)
ctrl4 = jnp.zeros((4, 1024, 1024, 3), jnp.bfloat16)
vi4 = jnp.arange(4, dtype=jnp.int32)


def report(name, ma):
    print(f"{name:8s} args {ma.argument_size_in_bytes / GB:6.2f} GB  "
          f"out {ma.output_size_in_bytes / GB:6.2f} GB  "
          f"temp {ma.temp_size_in_bytes / GB:6.2f} GB", flush=True)
    return ma.temp_size_in_bytes


def phases(tag):
    run = make_refine_step(rm, ddim, 7.5, 0.6)
    ma = run(lat_full, 800, 780, ctx8, ctrl4, vcr_mode="store",
             view_idx=vi4, analyze=True)
    report(f"store/{tag}", ma)
    # cache avals from an eval_shape of the same step
    cache_shapes = jax.eval_shape(
        lambda l: make_refine_step(rm, ddim, 7.5, 0.6)(
            l, 800, 780, ctx8, ctrl4, vcr_mode="store", view_idx=vi4),
        lat_full)[1]
    cache_a = [jnp.zeros(s.shape, s.dtype) for s in cache_shapes]
    cbytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                 for s in cache_shapes)
    print(f"cache_a  {cbytes / GB:.2f} GB x2 (key) +comb "
          f"{2 * cbytes / GB:.2f} GB resident in dense", flush=True)
    idx = jnp.arange(8, dtype=jnp.int32)
    ma = run(lat_full, 800, 780, ctx8, ctrl4, vcr_mode="key",
             vcr_cache=(cache_a,), vcr_idx=(idx,), view_idx=vi4,
             analyze=True)
    report(f"key/{tag}", ma)
    comb = [jnp.concatenate([c, c], axis=0) for c in cache_a]
    w = {"w_l": 0.75, "w_r": 0.25, "lambda_self": 0.55}
    ma = run(lat_full, 800, 780, ctx8, ctrl4, vcr_mode="dense",
             vcr_cache=(comb,), vcr_idx=(idx, idx), vcr_weights=w,
             view_idx=vi4, analyze=True)
    report(f"dense/{tag}", ma)


for budget in ("2e9", "7e9"):
    os.environ["GIP_ATTN_SCORE_BYTES"] = budget
    phases(budget)

# VAE sweeps (mirror refine_views' lax.map shape: vae_bs=2 inside the jit)
img32 = jnp.zeros((32, 1024, 1024, 3), jnp.bfloat16)


@jax.jit
def enc(p, img):
    ch = img.reshape(16, 2, 1024, 1024, 3)
    return jax.lax.map(lambda c: vae.apply(p, c * 2 - 1, method=vae.encode),
                       ch)


@jax.jit
def dec(p, lat):
    ch = lat.reshape(16, 2, 128, 128, 4)
    return jax.lax.map(lambda c: vae.apply(p, c, method=vae.decode), ch)


report("vae_enc", enc.lower(vp, img32).compile().memory_analysis())
report("vae_dec", dec.lower(
    vp, jnp.zeros((32, 128, 128, 4), jnp.bfloat16)).compile()
    .memory_analysis())
wb = sum(int(np.prod(x.shape)) * x.dtype.itemsize
         for x in jax.tree_util.tree_leaves((up, cp, vp)))
print(f"weights  {wb / GB:.2f} GB resident throughout", flush=True)
