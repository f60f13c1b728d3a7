"""Attention layout equivalence: the dT (sublane-contraction) layout and
the chunked online-softmax path must match the base jax.nn SDPA.

The dT layout targets the TPU lane-padding waste at SD1.5 head dims
(40/80/160 on 128 lanes — reference workload ipa_guidance.py:396-411);
it is the same math with reassociated matmuls, so results match to
accumulation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.diffusion.blocks import (_attend, _attend_chunked,
                                             _attend_dT)


def _qkv(rng, b, s, h, d, dt=jnp.float32):
    q = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dt)
    k = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dt)
    v = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dt)
    return q, k, v


def test_dT_matches_base(rng):
    for (b, s, h, d) in [(2, 64, 8, 40), (2, 48, 8, 80), (1, 33, 4, 160)]:
        q, k, v = _qkv(rng, b, s, h, d)
        a = jax.nn.dot_product_attention(q, k, v)
        bb = _attend_dT(q, k, v)
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=0, atol=2e-5)


def test_dT_env_flag_routes(rng, monkeypatch):
    monkeypatch.setenv("GIP_ATTN_LAYOUT", "dT")
    b, s, h, d = 2, 64, 8, 40
    q, k, v = _qkv(rng, b, s, h, d)
    out = _attend(q.reshape(b, s, h * d), k.reshape(b, s, h * d),
                  v.reshape(b, s, h * d), h)
    monkeypatch.setenv("GIP_ATTN_LAYOUT", "base")
    ref = _attend(q.reshape(b, s, h * d), k.reshape(b, s, h * d),
                  v.reshape(b, s, h * d), h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_chunked_matches_base(rng, monkeypatch):
    monkeypatch.setenv("GIP_ATTN_Q_CHUNK", "32")
    monkeypatch.setenv("GIP_ATTN_KV_CHUNK", "32")
    b, s, h, d = 2, 70, 4, 40  # non-multiple of chunk: exercises padding
    q, k, v = _qkv(rng, b, s, h, d)
    a = jax.nn.dot_product_attention(q, k, v)
    c = _attend_chunked(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=0, atol=2e-5)
