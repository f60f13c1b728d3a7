"""Building blocks for the SD1.5-class UNet / ControlNet in Flax (NHWC).

From-scratch TPU-native implementation of the architecture the reference
drives through diffusers (reference: threestudio/models/guidance/
ipa_guidance.py:137-233, models/pipeline_ipa_controlnet.py). Three attention
extensions are folded in *functionally* instead of diffusers' mutable
"attention processor" objects:

  * LoRA adapters on q/k/v/out (the IP-Adapter-FaceID installs rank-128 LoRA,
    reference: ip_adapter/ip_adapter_faceid.py:286-329) — parameters exist
    only when `lora_rank > 0`;
  * IP-Adapter decomposed cross-attention: the last `ip_tokens` of the
    encoder states attend through separate to_k_ip/to_v_ip projections and
    are added with a scale (reference: ip_adapter/attention_processor_faceid.py
    LoRAIPAttnProcessor2_0, :406-523);
  * VCR mutual attention on selected self-attention layers: anchors store
    their (pre-projection) hidden states, key views attend over
    concat(self, anchor), dense views blend self-attention with attention
    into two key views (reference: attention_processor_faceid.py:211-364),
    threaded through the call as an explicit cache pytree instead of
    processor mutable state.

All convs/norms run in NHWC; attention sequence layout is [B, S, D].
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv_pallas import Conv3x3
from .norm import FastGroupNorm


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0):
    """Sinusoidal timestep embedding, diffusers convention for SD1.5."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * t[:, None].astype(jnp.float32)
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = FastGroupNorm(self.groups, epsilon=1e-5, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = FastGroupNorm(self.groups, epsilon=1e-5, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class LoRADense(nn.Module):
    """Dense with optional LoRA adapter: y = W x + scale * B(A(x))."""
    features: int
    lora_rank: int = 0
    lora_scale: float = 1.0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="main")(x)
        if self.lora_rank > 0:
            a = nn.Dense(self.lora_rank, use_bias=False, dtype=self.dtype,
                         name="lora_down")(x)
            b = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros, name="lora_up")(a)
            y = y + self.lora_scale * b
        return y


# above this many bytes of materialized f32 scores (B*H*Sq*Sk*4), attention
# switches to the chunked online-softmax path (XLA would otherwise
# materialize the full logits — 68 GB at the 1024^2-refine 16384-token
# layers; the reference leans on xformers for the same reason,
# ipa_guidance.py:180). Tuned so the stage-1 ANPG layers (6.4 GB transient,
# measured 2x faster through plain XLA) stay unchunked.
_CHUNKED_SCORE_BYTES = 7e9


import os as _os


def _attend_chunked(q, k, v, q_chunk: int = 0, kv_chunk: int = 0):
    """Exact attention, chunked over BOTH query and KV with a running
    (max, denominator, accumulator) — the flash-attention recurrence
    expressed in XLA ops, so the matmuls run at full MXU speed for any head
    dim while the live score block stays at B*H*q_chunk*kv_chunk floats.
    q/k/v: [B, S, H, Dh]."""
    # chunk sizes resolve from env at TRACE time (not import time) so A/B
    # harnesses can flip them between jit calls in one process
    q_chunk = q_chunk or int(_os.environ.get("GIP_ATTN_Q_CHUNK", "1024"))
    kv_chunk = kv_chunk or int(_os.environ.get("GIP_ATTN_KV_CHUNK", "1024"))
    b, sq, h, dh = q.shape
    sk = k.shape[1]
    nq = -(-sq // q_chunk)
    nc = -(-sk // kv_chunk)
    qpad = nq * q_chunk - sq
    kpad = nc * kv_chunk - sk
    if qpad:
        q = jnp.pad(q, ((0, 0), (0, qpad), (0, 0), (0, 0)))
    if kpad:
        k = jnp.pad(k, ((0, 0), (0, kpad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kpad), (0, 0), (0, 0)))
    scale = 1.0 / (dh ** 0.5)
    qf = (q * scale).transpose(0, 2, 1, 3).reshape(b, h, nq, q_chunk, dh)
    kc = k.transpose(0, 2, 1, 3).reshape(b, h, nc, kv_chunk, dh)
    vc = v.transpose(0, 2, 1, 3).reshape(b, h, nc, kv_chunk, dh)
    kv_mask = (jnp.arange(nc * kv_chunk) < sk).reshape(nc, kv_chunk)

    def q_block(qb):  # [B, H, qc, Dh]
        def body(carry, xs):
            m, den, acc = carry
            kb, vb, mask = xs
            s = jnp.einsum("bhqd,bhcd->bhqc", qb, kb,
                           preferred_element_type=jnp.float32)
            s = jnp.where(mask[None, None, None, :], s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[..., None])
            den = den * alpha + jnp.sum(p, axis=-1)
            acc = acc * alpha[..., None] + jnp.einsum(
                "bhqc,bhcd->bhqd", p.astype(vb.dtype), vb,
                preferred_element_type=jnp.float32)
            return (m_new, den, acc), None

        init = (jnp.full((b, h, q_chunk), -jnp.inf, jnp.float32),
                jnp.zeros((b, h, q_chunk), jnp.float32),
                jnp.zeros((b, h, q_chunk, dh), jnp.float32))
        (m, den, acc), _ = jax.lax.scan(
            body, init,
            (kc.transpose(2, 0, 1, 3, 4), vc.transpose(2, 0, 1, 3, 4),
             kv_mask))
        return acc / den[..., None]

    out = jax.lax.map(q_block, qf.transpose(2, 0, 1, 3, 4))  # [nq,B,H,qc,Dh]
    out = out.transpose(1, 0, 3, 2, 4).reshape(b, nq * q_chunk, h, dh)
    if qpad:
        out = out[:, :sq]
    return out.astype(q.dtype)


def _attend(q, k, v, heads: int):
    """[B, S, D] multi-head SDPA (jax.nn expects [B, S, H, Dh])."""
    b, sq, d = q.shape
    sk = k.shape[1]
    hd = d // heads
    qh = q.reshape(b, sq, heads, hd)
    kh = k.reshape(b, sk, heads, hd)
    vh = v.reshape(b, sk, heads, hd)
    # threshold read at TRACE time: stage 2 lowers it (GIP_ATTN_SCORE_BYTES)
    # so the 64^2-level self-attention (4.3 GB of f32 scores at CFG batch 8)
    # chunks instead of landing on top of the VCR caches — one step's
    # unchunked phases RESOURCE_EXHAUSTED the 16 GB chip (r5 bench_pipeline)
    budget = float(_os.environ.get("GIP_ATTN_SCORE_BYTES",
                                   _CHUNKED_SCORE_BYTES))
    if b * heads * sq * sk * 4 > budget:
        o = _attend_chunked(qh, kh, vh)
    else:
        # base XLA SDPA: every re-layout aimed at the head_dim-40 lane
        # padding MEASURED WORSE (r5 probe_attnpack @ B6 S4096 H8 d40:
        # base 7.39 ms, einsum 7.43, sublane-d 7.72, pack3 8.40,
        # pad64 22.75) — the padded contraction is already optimal
        o = jax.nn.dot_product_attention(qh, kh, vh)
    return o.reshape(b, sq, d)


class Attention(nn.Module):
    """Self- or cross-attention with LoRA, IP-Adapter tokens, and VCR modes.

    vcr op (self-attention layers only): a dict
      {"mode": one of "off"|"store"|"key"|"dense" (STATIC),
       "src": [B, S, D] anchor hidden states (key mode),
       "src_l"/"src_r": [B, S, D] (dense mode),
       "w_l"/"w_r": scalars, "lambda_self": scalar}
    Returns (out, stored) where stored is the hidden states to cache
    ("store" mode) or None.
    """
    query_dim: int
    heads: int
    cross_attention_dim: Optional[int] = None
    lora_rank: int = 0
    ip_tokens: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None, ip_scale=1.0,
                 vcr=None):
        d = self.query_dim
        to_q = LoRADense(d, self.lora_rank, use_bias=False, dtype=self.dtype,
                         name="to_q")
        to_k = LoRADense(d, self.lora_rank, use_bias=False, dtype=self.dtype,
                         name="to_k")
        to_v = LoRADense(d, self.lora_rank, use_bias=False, dtype=self.dtype,
                         name="to_v")
        to_out = LoRADense(d, self.lora_rank, use_bias=True, dtype=self.dtype,
                           name="to_out")

        q = to_q(hidden_states)
        stored = None
        is_cross = encoder_hidden_states is not None

        if is_cross and self.ip_tokens > 0:
            txt = encoder_hidden_states[:, : -self.ip_tokens]
            ip = encoder_hidden_states[:, -self.ip_tokens :]
            k = to_k(txt)
            v = to_v(txt)
            out = _attend(q, k, v, self.heads)
            k_ip = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k_ip")(ip)
            v_ip = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v_ip")(ip)
            out = out + ip_scale * _attend(q, k_ip, v_ip, self.heads)
        elif is_cross:
            out = _attend(q, to_k(encoder_hidden_states),
                          to_v(encoder_hidden_states), self.heads)
        else:
            mode = "off" if vcr is None else vcr["mode"]
            if mode == "store":
                stored = hidden_states
                out = _attend(q, to_k(hidden_states), to_v(hidden_states),
                              self.heads)
            elif mode == "key":
                # key views BOTH store (dense views consume them) and attend
                # over concat(self, anchor) (reference:
                # attention_processor_faceid.py:292-312)
                stored = hidden_states
                kv_src = jnp.concatenate([hidden_states, vcr["src"]], axis=1)
                out = _attend(q, to_k(kv_src), to_v(kv_src), self.heads)
            elif mode == "dense":
                out_self = _attend(q, to_k(hidden_states), to_v(hidden_states),
                                   self.heads)
                out_l = _attend(q, to_k(vcr["src_l"]), to_v(vcr["src_l"]),
                                self.heads)
                out_r = _attend(q, to_k(vcr["src_r"]), to_v(vcr["src_r"]),
                                self.heads)
                lam = vcr["lambda_self"]
                out = lam * out_self + (1.0 - lam) * (
                    vcr["w_l"] * out_l + vcr["w_r"] * out_r
                )
            else:
                out = _attend(q, to_k(hidden_states), to_v(hidden_states),
                              self.heads)
        return to_out(out), stored


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="geglu_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU: diffusers GEGLU uses F.gelu's default, not the
        # tanh approximation
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(h)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    cross_attention_dim: int
    lora_rank: int = 0
    ip_tokens: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_scale=1.0, vcr=None):
        h, stored = Attention(
            self.dim, self.heads, lora_rank=self.lora_rank, dtype=self.dtype,
            name="attn1",
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x), vcr=vcr)
        x = x + h
        h, _ = Attention(
            self.dim, self.heads, cross_attention_dim=self.cross_attention_dim,
            lora_rank=self.lora_rank, ip_tokens=self.ip_tokens, dtype=self.dtype,
            name="attn2",
        )(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x),
            encoder_hidden_states=context, ip_scale=ip_scale,
        )
        x = x + h
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        )
        return x, stored


class Transformer2D(nn.Module):
    """GroupNorm -> 1x1 conv in -> transformer block(s) -> 1x1 conv out,
    residual (diffusers Transformer2DModel, use_linear_projection=False)."""
    channels: int
    heads: int
    cross_attention_dim: int
    n_blocks: int = 1
    lora_rank: int = 0
    ip_tokens: int = 0
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_scale=1.0, vcr=None):
        b, h, w, c = x.shape
        residual = x
        y = FastGroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(b, h * w, c)
        stored = None
        for i in range(self.n_blocks):
            y, s = TransformerBlock(
                self.channels, self.heads, self.cross_attention_dim,
                lora_rank=self.lora_rank, ip_tokens=self.ip_tokens,
                dtype=self.dtype, name=f"block_{i}",
            )(y, context, ip_scale=ip_scale, vcr=vcr if i == 0 else None)
            if i == 0:
                stored = s
        y = y.reshape(b, h, w, c)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(y)
        return y + residual, stored


class Downsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv3x3(self.channels, stride=2, dtype=self.dtype,
                       name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return Conv3x3(self.channels, dtype=self.dtype, name="conv")(x)
