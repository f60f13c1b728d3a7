"""IP-Adapter-FaceID-Plus projection heads in Flax.

Behavioral rebuild of the reference's identity-conditioning models
(reference: threestudio/models/guidance/models/ip_adapter/
ip_adapter_faceid.py:27-117 and resampler.py:13-78):

  * ProjPlusModel: MLP projects the 512-d ArcFace ID embedding to
    num_tokens x 768 tokens, then a 4-layer FacePerceiverResampler attends
    over the CLIP-ViT-H penultimate hidden states (257 x 1280) with the ID
    tokens as latents; `shortcut=True` returns tokens + scale * resampled
    (the FaceID-PlusV2 path the reference uses, s_scale=0.4,
    configs/exp.yaml:95);
  * the pos/null/neg embedding triple: (real face, irrelevant face, zeros)
    (reference: ip_adapter_faceid.py:363-382).

The UNet-side decomposed attention (to_k_ip/to_v_ip + LoRA) lives in
diffusion/blocks.py.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class PerceiverAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(latents)
        b, l, _ = latents.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(
            kv_in
        )
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(b, t.shape[1], self.heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        scale = 1.0 / math.sqrt(math.sqrt(self.dim_head))
        w = (q * scale) @ jnp.swapaxes(k * scale, -2, -1)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        out = (w @ v).transpose(0, 2, 1, 3).reshape(b, l, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(
            out
        )


class ResamplerFF(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.dim * self.mult, use_bias=False, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.gelu(x)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(x)


class FacePerceiverResampler(nn.Module):
    dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 16
    embedding_dim: int = 1280
    output_dim: int = 768
    ff_mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latents, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            latents = PerceiverAttention(
                self.dim, self.dim_head, self.heads, dtype=self.dtype,
                name=f"attn_{i}",
            )(x, latents) + latents
            latents = ResamplerFF(self.dim, self.ff_mult, dtype=self.dtype,
                                  name=f"ff_{i}")(latents) + latents
        latents = nn.Dense(self.output_dim, dtype=self.dtype, name="proj_out")(
            latents
        )
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(latents)


class ProjPlusModel(nn.Module):
    cross_attention_dim: int = 768
    id_embeddings_dim: int = 512
    clip_embeddings_dim: int = 1280
    num_tokens: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, id_embeds, clip_embeds, shortcut: bool = False,
                 scale: float = 1.0):
        """id_embeds [B, 512]; clip_embeds [B, 257, 1280] (CLIP-ViT-H
        penultimate hidden states) -> [B, num_tokens, 768]."""
        x = nn.Dense(self.id_embeddings_dim * 2, dtype=self.dtype,
                     name="proj_fc1")(id_embeds)
        x = nn.gelu(x)
        x = nn.Dense(self.cross_attention_dim * self.num_tokens,
                     dtype=self.dtype, name="proj_fc2")(x)
        x = x.reshape(-1, self.num_tokens, self.cross_attention_dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        out = FacePerceiverResampler(
            dim=self.cross_attention_dim,
            heads=self.cross_attention_dim // 64,
            embedding_dim=self.clip_embeddings_dim,
            output_dim=self.cross_attention_dim,
            dtype=self.dtype,
            name="perceiver_resampler",
        )(x, clip_embeds)
        if shortcut:
            out = x + scale * out
        return out


class Resampler(nn.Module):
    """Generic perceiver resampler for the non-FaceID IP-Adapter-Plus
    variants (reference: ip_adapter/resampler.py:81-140 and IPAdapterPlus
    init_proj, ip_adapter.py:287-300): learned latent queries attend over the
    CLIP penultimate hidden states, depth x (PerceiverAttention + FF)."""
    dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 768
    ff_mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, S, embedding_dim] -> [B, num_queries, output_dim]."""
        b = x.shape[0]
        latents = self.param(
            "latents",
            lambda k, s: jax.random.normal(k, s) / (self.dim ** 0.5),
            (1, self.num_queries, self.dim),
        )
        latents = jnp.broadcast_to(latents, (b,) + latents.shape[1:])
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            latents = PerceiverAttention(
                self.dim, self.dim_head, self.heads, dtype=self.dtype,
                name=f"attn_{i}",
            )(x, latents) + latents
            latents = ResamplerFF(self.dim, self.ff_mult, dtype=self.dtype,
                                  name=f"ff_{i}")(latents) + latents
        latents = nn.Dense(self.output_dim, dtype=self.dtype,
                           name="proj_out")(latents)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="norm_out")(latents)


def ipa_plus_image_embeds(resampler, params, clip_hidden, zero_clip_hidden):
    """Non-FaceID IPAdapterPlus embed pair: (cond tokens, uncond tokens)
    (reference: ip_adapter.py:302-313)."""
    pos = resampler.apply(params, clip_hidden)
    neg = resampler.apply(params, zero_clip_hidden)
    return pos, neg
