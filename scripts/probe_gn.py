"""Isolated GroupNorm fwd / fwd+bwd at the VAE's hot shapes on TPU.

Variants: fast (custom VJP), flax (stock), plus micro-decompositions
(red = the [B,C] spatial reduction alone, ew = one fused elementwise pass).
Usage: probe_gn.py [fast|flax|red|ew|silu] [bf16|f32]
K-chained per NOTES gotcha 1.
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

from flax import linen as nn
from gaussianip_tpu.diffusion.norm import FastGroupNorm, group_norm

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "fast"
DT = jnp.float32 if (len(sys.argv) > 2 and sys.argv[2] == "f32") else jnp.bfloat16
K = 8
SHAPES = [(4, 512, 512, 128), (4, 256, 256, 256), (4, 128, 128, 512),
          (4, 64, 64, 512)]


def run(shape):
    b, h, w, c = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, shape), DT)
    sc = jnp.ones((c,), jnp.float32)
    bi = jnp.zeros((c,), jnp.float32)

    if VARIANT in ("fast", "flax"):
        mod = (FastGroupNorm(32, epsilon=1e-6, dtype=DT) if VARIANT == "fast"
               else nn.GroupNorm(32, epsilon=1e-6, dtype=DT))
        params = {"params": {"scale": sc, "bias": bi}}

        def one(xx):
            return jnp.sum(mod.apply(params, xx).astype(jnp.float32) ** 2)
    elif VARIANT == "red":
        def one(xx):
            xf = xx.astype(jnp.float32)
            return jnp.sum(jnp.sum(xf, axis=(1, 2)) ** 2) + \
                jnp.sum(jnp.sum(xf * xf, axis=(1, 2)))
    elif VARIANT == "silu":
        def one(xx):
            return jnp.sum(nn.silu(xx).astype(jnp.float32) ** 2)
    else:  # ew: one a*x+b pass with per-(B,C) coefficients
        a = jnp.ones((b, c), jnp.float32)
        bb = jnp.zeros((b, c), jnp.float32)

        def one(xx):
            y = xx.astype(jnp.float32) * a[:, None, None, :] \
                + bb[:, None, None, :]
            return jnp.sum(y.astype(jnp.float32) ** 2)

    def mk_chain(grad):
        @jax.jit
        def chain(xx):
            carry = jnp.float32(0.0)
            for _ in range(K):
                x2 = xx + (carry * 1e-12).astype(xx.dtype)
                if grad:
                    v, g = jax.value_and_grad(one)(x2)
                    carry = v * 1e-12 + jnp.sum(g.astype(jnp.float32))
                else:
                    carry = one(x2)
            return carry
        return chain

    @jax.jit
    def trivial(xx):
        return jnp.sum(xx.astype(jnp.float32))

    float(trivial(x))
    t0 = time.time()
    float(trivial(x))
    rpc = time.time() - t0

    out = []
    for grad in (False, True):
        ch = mk_chain(grad)
        float(ch(x))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(ch(x))
            ts.append(time.time() - t0)
        out.append((min(ts) - rpc) / K * 1000)
    gb = np.prod(shape) * (2 if DT == jnp.bfloat16 else 4) / 1e9
    print(f"{VARIANT:5s} {str(shape):20s} fwd {out[0]:7.3f} ms  "
          f"f+b {out[1]:7.3f} ms  ({gb*1e3:.0f} MB)", flush=True)


for s in SHAPES:
    run(s)
