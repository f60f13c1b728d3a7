"""In-context FastGroupNorm A/B (VERDICT r4 #4), ONE process: the axon
client init costs ~10 min per process, so both arms of both graphs run
here, flipping norm._USE_NAIVE between traces (it is read at trace time).

Graphs (the two stage-1 consumers of GroupNorm):
  vae   VAE encode fwd+bwd wrt input @ (4, 512, 512, 3) bf16 — the SDS
        loss backprops through the encoder (reference:
        ipa_guidance.py:522-531); probe_vae r4: 204.4 ms full vs 78.9 nogn
        predicted ~125 ms collectible.
  unet  UNet+ControlNet denoise fwd @ 12x64^2 bf16 (reference workload:
        ipa_guidance.py:396-411); r4 nogn delta was only 2 ms — verify the
        custom VJP does not regress it.
K-chained timing per NOTES gotcha 1.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import gaussianip_tpu.diffusion.norm as N
from gaussianip_tpu.diffusion.unet import (ControlNetModel,
                                           UNet2DConditionModel, UNetConfig)
from gaussianip_tpu.diffusion.vae import AutoencoderKL, VAEConfig

key = jax.random.PRNGKey(0)
mk = lambda tree: jax.tree_util.tree_map(
    # f32 frozen params (the flax init default): bf16 params MEASURED ~25
    # ms/step SLOWER on the stage-1 step (444.8/448.1 f32 vs 467.2/471.2
    # bf16, r5) and f32 fits HBM in every stage next to the capped
    # attention budget (probe_refinemem) — production load_real_models
    # keeps f32 params for the same reason
    lambda sd: jnp.zeros(sd.shape, sd.dtype), tree)

# ---- VAE encode graph ----
vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16))
vparams = mk(jax.eval_shape(vae.init, key,
                            jnp.zeros((1, 64, 64, 3), jnp.bfloat16)))
# batch 2 (not the production 4): the naive/flax arm's backward SAVES f32
# xhat residuals per GroupNorm layer (the custom VJP recomputes instead)
# and RESOURCE_EXHAUSTED the chip at batch 4 — r5 queue log. The A/B is
# relative; scale per-image cost x2 when comparing to bench_pipeline.
x_vae = jnp.zeros((2, 512, 512, 3), jnp.bfloat16)
nkey = jax.random.PRNGKey(1)
KV = 6


def make_vae():
    def loss(xx, p):
        lat = vae.apply(p, xx, nkey, method=vae.encode)
        return jnp.sum(lat.astype(jnp.float32) ** 2)

    @jax.jit
    def f(p, x):
        carry = jnp.float32(0.0)
        for _ in range(KV):
            x2 = x + (carry * 1e-12).astype(x.dtype)
            g = jax.grad(loss)(x2, p)
            carry = jnp.sum(g.astype(jnp.float32))
        return carry

    return f


# ---- UNet+CN denoise graph ----
unet = UNet2DConditionModel(UNetConfig(lora_rank=0, ip_tokens=4,
                                       dtype=jnp.bfloat16))
cn = ControlNetModel(UNetConfig(lora_rank=0, ip_tokens=0,
                                dtype=jnp.bfloat16))
lat0 = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
t0_ = jnp.zeros((1,), jnp.int32)
ctx0 = jnp.zeros((1, 81, 768), jnp.bfloat16)
cimg0 = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
uparams = mk(jax.eval_shape(unet.init, key, lat0, t0_, ctx0))
cparams = mk(jax.eval_shape(cn.init, key, lat0, t0_, ctx0, cimg0))
lat = jnp.zeros((12, 64, 64, 4), jnp.bfloat16)
ts_ = jnp.full((12,), 500, jnp.int32)
ctx = jnp.zeros((12, 81, 768), jnp.bfloat16)
cimg = jnp.zeros((12, 512, 512, 3), jnp.bfloat16)
KU = 4


def make_unet():
    @jax.jit
    def f(uparams, cparams, lat):
        carry = jnp.float32(0.0)
        for _ in range(KU):
            l2 = lat + (carry * 1e-12).astype(lat.dtype)
            dr, mid = cn.apply(cparams, l2, ts_, ctx, cimg)
            eps, _ = unet.apply(uparams, l2, ts_, ctx,
                                down_block_residuals=dr,
                                mid_block_residual=mid)
            carry = jnp.sum(eps.astype(jnp.float32))
        return carry

    return f


@jax.jit
def trivial(x):
    return jnp.sum(x.astype(jnp.float32))


def timeit(f, *args, reps=4):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
t_rpc = timeit(trivial, x_vae)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)
only = set(sys.argv[1:])
for naive in (False, True):
    tag = "naive" if naive else "fast"
    if only and tag not in only:
        continue
    N._USE_NAIVE = naive
    t = max(timeit(make_vae(), vparams, x_vae) - t_rpc, 1e-9) / KV
    print(f"[{time.time()-t0:.0f}s] vae  gn={tag:5s} {t*1e3:8.2f} ms",
          flush=True)
    t = max(timeit(make_unet(), uparams, cparams, lat) - t_rpc, 1e-9) / KU
    print(f"[{time.time()-t0:.0f}s] unet gn={tag:5s} {t*1e3:8.2f} ms",
          flush=True)
