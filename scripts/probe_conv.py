"""Pallas fused conv3x3 vs XLA conv at VAE/UNet/VGG shapes on TPU (bf16)."""
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

from gaussianip_tpu.ops.conv_pallas import _conv3x3_pallas, _xla_conv, conv3x3

SHAPES = [  # (tag, B, H, W, Ci, Co)
    ("vae512x128", 4, 512, 512, 128, 128),
    ("vae256x256", 4, 256, 256, 256, 256),
    ("vae128x512", 4, 128, 128, 512, 512),
    ("unet64x640", 12, 64, 64, 640, 640),
    ("unet32x640", 12, 32, 32, 640, 640),
    ("unet16x1280", 12, 16, 16, 1280, 1280),
    ("vgg207x256", 4, 208, 144, 256, 256),
]

rng = np.random.default_rng(0)
dt = jnp.bfloat16


@jax.jit
def trivial(x):
    return jnp.sum(x[0, 0, 0].astype(jnp.float32))


def timeit(f, *args, reps=3):
    scal = jax.jit(lambda *a: jnp.sum(
        jax.tree_util.tree_leaves(f(*a))[0].astype(jnp.float32)))
    float(scal(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(scal(*args))
        ts.append(time.time() - t0)
    return min(ts)


def chain(f, n=8):
    @jax.jit
    def g(x, k):
        o = f(x, k)
        for _ in range(n - 1):
            o = f(x + o * jnp.asarray(1e-6, o.dtype), k)
        return o
    return g


def chain_grad(f, n=4):
    def loss(x, k):
        return jnp.sum(f(x, k).astype(jnp.float32) ** 2)

    gf = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def g(x, k):
        acc = jnp.float32(0.0)
        for _ in range(n):
            gx, gk = gf(x + acc.astype(x.dtype) * jnp.asarray(1e-12, x.dtype), k)
            acc = acc + jnp.sum(gx.astype(jnp.float32)[0, 0, 0])
        return acc
    return g


N = 6
for tag, b, h, w, ci, co in SHAPES:
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, ci)).astype(np.float32), dt)
    k = jnp.asarray(rng.normal(0, 0.05, (3, 3, ci, co)).astype(np.float32), dt)
    t_rpc = timeit(trivial, x)
    flops = 2 * b * h * w * ci * co * 9

    err = float(jnp.max(jnp.abs(
        _xla_conv(x, k).astype(jnp.float32)
        - _conv3x3_pallas(x, k).astype(jnp.float32))))
    tx = (timeit(chain(_xla_conv, N), x, k) - t_rpc) / N
    tp = (timeit(chain(_conv3x3_pallas, N), x, k) - t_rpc) / N
    txg = (timeit(chain_grad(_xla_conv, N), x, k) - t_rpc) / N
    tpg = (timeit(chain_grad(
        lambda x, k: conv3x3(x, k), N), x, k) - t_rpc) / N
    print(f"{tag:12s} err {err:8.4f} | fwd xla {tx*1e3:6.2f} ms "
          f"{flops/tx/1e12:5.1f} TF/s, pallas {tp*1e3:6.2f} ms "
          f"{flops/tp/1e12:5.1f} TF/s | fwd+bwd xla {txg*1e3:7.2f} ms, "
          f"pallas {tpg*1e3:7.2f} ms", flush=True)
