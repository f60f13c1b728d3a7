"""Probe: pallas flash attention at SD1.5 self-attn shapes on TPU."""
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

from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

B, H, S, D = 12, 8, 4096, 40  # SD1.5 320ch attn1 at 64^2, 3-way CFG batch 4
dt = jnp.bfloat16

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), dt)
k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), dt)
v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), dt)

sm = 1.0 / float(np.sqrt(D))


@jax.jit
def xla_attn(q, k, v):
    o = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3))
    return o.transpose(0, 2, 1, 3)


@jax.jit
def flash(q, k, v):
    return flash_attention(q, k, v, sm_scale=sm)


def chain(f, n=8):
    @jax.jit
    def g(q, k, v):
        o = f(q, k, v)
        for _ in range(n - 1):
            o = f(q + o * jnp.asarray(1e-6, dt), k, v)
        return jnp.sum(o.astype(jnp.float32))
    return g


@jax.jit
def trivial(q):
    return jnp.sum(q[0, 0, 0].astype(jnp.float32))


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t_rpc = timeit(trivial, q)
N = 8
o1 = xla_attn(q, k, v)
o2 = flash(q, k, v)
err = jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))
print("max_abs_err:", float(err))

t_x = (timeit(chain(xla_attn, N), q, k, v) - t_rpc) / N
t_f = (timeit(chain(flash, N), q, k, v) - t_rpc) / N
flops = 4 * B * H * S * S * D
print(f"xla:   {t_x*1000:.2f} ms  {flops/t_x/1e12:.1f} TF/s")
print(f"flash: {t_f*1000:.2f} ms  {flops/t_f/1e12:.1f} TF/s")

# bwd
def mkloss(f):
    def loss(q, k, v):
        return jnp.sum(f(q, k, v).astype(jnp.float32) ** 2)
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

gx = mkloss(xla_attn)(q, k, v)
gf = mkloss(flash)(q, k, v)
for a, b, nm in zip(gx, gf, "qkv"):
    e = jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    print(f"grad {nm} max_err {float(e):.4f}")
