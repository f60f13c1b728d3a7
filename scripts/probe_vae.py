"""Attribution of the stage-1 VAE encode fwd+bwd (~232 ms r3 NOTES, the
largest single term of the 558 ms train step): the SDS loss backprops
through the VAE encoder to the rendered pixels
(reference: ipa_guidance.py:522-531 + GaussianIP.py:382 backward).

One variant per process (patches leak across traces otherwise):
  fwd (encode only) | full (fwd+bwd wrt input) | nogn (GroupNorm ->
  identity) | noattn (mid attention -> identity) | f32 (float32).
K-chained timing per NOTES gotcha 1. Usage: probe_vae.py <variant>
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

import flax.linen as fnn

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
K = 6

import gaussianip_tpu.diffusion.norm as N

if VARIANT == "nogn":
    class _IdGN(fnn.Module):
        num_groups: int = 32
        epsilon: float = 1e-5
        dtype: object = None

        def __call__(self, x):
            return x

    N.FastGroupNorm = _IdGN
elif VARIANT == "flaxgn":
    # A/B: the stock flax GroupNorm (XLA-derived backward) vs the custom VJP
    N.FastGroupNorm = fnn.GroupNorm

import gaussianip_tpu.diffusion.vae as V

if VARIANT == "noattn":
    V.VAEAttention.__call__ = lambda self, x: x

dtype = jnp.float32 if VARIANT == "f32" else jnp.bfloat16
vae = V.AutoencoderKL(V.VAEConfig(dtype=dtype))
key = jax.random.PRNGKey(0)
x0 = jnp.zeros((1, 64, 64, 3), dtype)
shapes = jax.eval_shape(vae.init, key, x0)


@jax.jit
def mk():
    return jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)


params = mk()
jax.block_until_ready(params)
x = jnp.zeros((4, 512, 512, 3), dtype)
nkey = jax.random.PRNGKey(1)


def encode(p, xx):
    return vae.apply(p, xx, nkey, method=vae.encode)


if VARIANT == "fwd":
    @jax.jit
    def f(p, x):
        carry = jnp.float32(0.0)
        for _ in range(K):
            x2 = x + (carry * 1e-12).astype(x.dtype)
            lat = encode(p, x2)
            carry = jnp.sum(lat.astype(jnp.float32))
        return carry
else:
    def loss(xx, p):
        lat = encode(p, xx)
        return jnp.sum(lat.astype(jnp.float32) ** 2)

    @jax.jit
    def f(p, x):
        carry = jnp.float32(0.0)
        for _ in range(K):
            x2 = x + (carry * 1e-12).astype(x.dtype)
            g = jax.grad(loss)(x2, p)
            carry = jnp.sum(g.astype(jnp.float32))
        return carry


@jax.jit
def trivial(x):
    return jnp.sum(x.astype(jnp.float32))


def timeit(fn, *args, reps=4):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
t_rpc = timeit(trivial, x)
t = max(timeit(f, params, x) - t_rpc, 1e-9) / K
print(f"[{time.time()-t0:.0f}s] vae {VARIANT:7s} {t*1e3:8.2f} ms "
      f"(rpc {t_rpc*1e3:.0f})", flush=True)
