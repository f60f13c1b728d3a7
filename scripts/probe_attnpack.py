"""Attention layout A/B at the stage-1 UNet shapes: head_dim 40/80/160 on
8 heads. r4 attributed 53 ms of the 155 ms denoise to attention running at
the PADDED contraction roofline (dh 40 -> 128 lanes = ~69% wasted MXU
work). Candidate layouts keep dh off the 128-lane contraction position:

  base    jax.nn.dot_product_attention on [B,S,H,Dh] (current production)
  einsum  plain two-einsum SDPA, bhqd/bhkd->bhqk (what base lowers to)
  dT      transposed-d pipeline: contraction of QK^T over a SUBLANE d
          ("bhdq,bhdk->bhqk"), PV contracts the big k dim and emits [d,q]
          ("bhqk,bhdk->bhdq") — dh=40 = 5*8 sublanes, zero pad waste
  pad64   zero-pad dh to 64 (exact: zero dims add nothing to q.k; scale
          kept at dh_real**-0.5)
  pack3   fold 3-of-4 lane waste into the BATCH: reshape [B,H,S,Dh] ->
          [B*H, S, Dh] and let XLA batch 96 small matmuls (sanity row)

Each variant prints ms/call at the three per-level shapes, K-chained
(NOTES gotcha 1). Usage: probe_attnpack.py [variant ...]
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

# stage-1 self-attention shapes: (B=12 CFG-triple x 4 cams, seq, heads, dh)
# batch 6 (not the production 12): the base variant's materialized f32
# scores (12*8*4096^2*4 = 6.4 GB) RESOURCE_EXHAUSTED next to the K-chain
# buffers (r5 queue log); the layout comparison is ratio-preserving
SHAPES = [
    (6, 4096, 8, 40),
    (6, 1024, 8, 80),
    (6, 256, 8, 160),
]
K = 6
DT = jnp.bfloat16


def sdpa_base(q, k, v, scale):
    return jax.nn.dot_product_attention(q, k, v, scale=scale)


def sdpa_einsum(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype)


def sdpa_dT(q, k, v, scale):
    # [B,S,H,D] -> [B,H,D,S]; contraction of QK^T over sublane d
    qt = q.transpose(0, 2, 3, 1)
    kt = k.transpose(0, 2, 3, 1)
    vt = v.transpose(0, 2, 3, 1)
    s = jnp.einsum("bhdq,bhdk->bhqk", qt, kt,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhdk->bhdq", p.astype(v.dtype), vt,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype).transpose(0, 3, 1, 2)


def sdpa_pad64(q, k, v, scale):
    d = q.shape[-1]
    pad = (-d) % 64
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad)))
    o = jax.nn.dot_product_attention(q, k, v, scale=scale)
    return o  # caller slices [..., :d]


def sdpa_pack3(q, k, v, scale):
    b, s, h, d = q.shape
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    sc = jnp.einsum("gqd,gkd->gqk", qf, kf,
                    preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("gqk,gkd->gqd", p.astype(vf.dtype), vf,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype).reshape(b, h, s, d).transpose(0, 2, 1, 3)


VARIANTS = {
    "base": sdpa_base,
    "einsum": sdpa_einsum,
    "dT": sdpa_dT,
    "pad64": sdpa_pad64,
    "pack3": sdpa_pack3,
}


def make(fn, b, s, h, d):
    scale = 1.0 / (d ** 0.5)

    @jax.jit
    def f(q, k, v):
        carry = jnp.float32(0.0)
        for _ in range(K):
            q2 = q + (carry * 1e-12).astype(q.dtype)
            o = fn(q2, k, v, scale)
            carry = jnp.sum(o[..., :d].astype(jnp.float32))
        return carry

    return f


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


rng = np.random.default_rng(0)
t0 = time.time()
only = set(sys.argv[1:])
first = True
for b, s, h, d in SHAPES:
    q = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), DT)
    k = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), DT)
    v = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), DT)
    if first:
        t_rpc = timeit(trivial, q)
        print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)
        first = False
    ref = None
    for tag, fn in VARIANTS.items():
        if only and tag not in only:
            continue
        out = fn(q, k, v, 1.0 / d ** 0.5)[..., :d]
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            assert err < 0.05, (tag, err)
        t = max(timeit(make(fn, b, s, h, d), q, k, v) - t_rpc, 1e-9) / K
        flops = 2 * 2 * b * h * s * s * d
        print(f"[{time.time()-t0:.0f}s] d={d:3d} {tag:7s} {t*1e3:7.2f} ms  "
              f"({flops/t/1e12:5.1f} TF/s eff)", flush=True)
