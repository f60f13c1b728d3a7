"""The chunked online-softmax attention path must match the base jax.nn
SDPA (reference workload ipa_guidance.py:396-411). The dT / pad64 /
pack3 re-layouts aimed at the head_dim-40 lane padding were measured
WORSE on TPU and deleted (r5 probe_attnpack; NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.diffusion.blocks import _attend_chunked


def _qkv(rng, b, s, h, d, dt=jnp.float32):
    q = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dt)
    k = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dt)
    v = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dt)
    return q, k, v


def test_chunked_matches_base(rng, monkeypatch):
    monkeypatch.setenv("GIP_ATTN_Q_CHUNK", "32")
    monkeypatch.setenv("GIP_ATTN_KV_CHUNK", "32")
    b, s, h, d = 2, 70, 4, 40  # non-multiple of chunk: exercises padding
    q, k, v = _qkv(rng, b, s, h, d)
    a = jax.nn.dot_product_attention(q, k, v)
    c = _attend_chunked(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=0, atol=2e-5)
