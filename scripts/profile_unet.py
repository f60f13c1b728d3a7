"""Layer-wise profile of the SD1.5 UNet on TPU: which block type eats the
157 ms ANPG denoise? Times ResnetBlock / Transformer2D at each resolution,
plus the full UNet and ControlNet, at the recipe shape (12x64x64x4 bf16)."""
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

from gaussianip_tpu.diffusion.blocks import ResnetBlock, Transformer2D
from gaussianip_tpu.diffusion.unet import UNet2DConditionModel, UNetConfig

B = 12
DT = jnp.bfloat16
dev = jax.devices()[0]
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)


@jax.jit
def trivial(x):
    return jnp.sum(x.astype(jnp.float32))


def timeit(f, *args, reps=3):
    r = f(*args)
    jax.block_until_ready(r)
    float(r)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


x0 = jnp.asarray(rng.normal(0, 1, (B, 8, 8, 4)), DT)
t_rpc = timeit(trivial, x0)
print(f"rpc_floor_ms={t_rpc*1000:.1f}")

N = 8


def bench_module(name, mod, args_builder, flops):
    """Time module fwd (chained) at given shapes."""
    args = args_builder()
    params = mod.init(key, *args)
    params = jax.device_put(params, dev)
    args = jax.device_put(args, dev)

    @jax.jit
    def run(params, *args):
        out = mod.apply(params, *args)
        if isinstance(out, tuple):
            out = out[0]
        s = jnp.sum(out.astype(jnp.float32))
        for _ in range(N - 1):
            a0 = args[0] + (s * jnp.asarray(1e-9, DT)).astype(DT)
            out = mod.apply(params, a0, *args[1:])
            if isinstance(out, tuple):
                out = out[0]
            s = jnp.sum(out.astype(jnp.float32))
        return s

    t = max(timeit(run, params, *args) - t_rpc, 1e-9) / N
    print(f"{name:34s} {t*1000:8.2f} ms   {flops/t/1e12:6.1f} TF/s")
    return t


temb = jnp.asarray(rng.normal(0, 1, (B, 1280)), DT)
ctx = jnp.asarray(rng.normal(0, 1, (B, 93, 768)), DT)

total = 0.0
# (res, ch, n_resnet, n_attn) per resolution incl. up path
sched = [(64, 320, 2 + 3 + 1, 5), (32, 640, 2 + 3, 5),
         (16, 1280, 2 + 3, 5), (8, 1280, 2 + 2 + 3, 1)]
for res, ch, n_res, n_attn in sched:
    hw = res * res
    x = jnp.asarray(rng.normal(0, 1, (B, res, res, ch)), DT)
    conv_fl = 2 * B * hw * ch * ch * 9 * 2  # two 3x3 convs
    t_r = bench_module(f"Resnet {res}^2 c{ch}",
                       ResnetBlock(ch, 32, dtype=DT),
                       lambda: (x, temb), conv_fl)
    heads = 8
    attn_fl = (4 * B * hw * hw * ch  # attn1 qk+wv
               + 2 * B * hw * ch * ch * 4 * 2  # qkvo attn1+attn2 approx
               + 2 * B * hw * ch * ch * 4 * 2 * 2)  # GEGLU ff
    t_a = bench_module(f"Transformer {res}^2 c{ch}",
                       Transformer2D(ch, heads, 768, dtype=DT),
                       lambda: (x, ctx), attn_fl)
    total += n_res * t_r + n_attn * t_a
    print(f"   x{n_res} res, x{n_attn} attn -> {1000*(n_res*t_r+n_attn*t_a):.1f} ms")

print(f"sum of parts: {total*1000:.1f} ms")

# full UNet
cfg = UNetConfig(dtype=DT, lora_rank=128, ip_tokens=16)
unet = UNet2DConditionModel(cfg)
lat = jnp.asarray(rng.normal(0, 1, (B, 64, 64, 4)), DT)
ts = jnp.full((B,), 500, jnp.int32)
params = jax.device_put(
    unet.init(key, jnp.zeros((1, 8, 8, 4), DT), jnp.zeros((1,), jnp.int32),
              jnp.zeros((1, 93, 768), DT)), dev)


@jax.jit
def run_unet(params, lat):
    s = jnp.float32(0.0)
    for _ in range(4):
        out, _ = unet.apply(params, lat + (s * 1e-9).astype(DT), ts, ctx)
        s = jnp.sum(out.astype(jnp.float32))
    return s


t_u = max(timeit(run_unet, params, lat) - t_rpc, 1e-9) / 4
print(f"full UNet (B=12, lora128, ip16): {t_u*1000:.2f} ms")
