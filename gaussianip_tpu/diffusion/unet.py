"""SD1.5-class conditional UNet in Flax (NHWC), with ControlNet residual
inputs and functional VCR cross-view attention cache.

Architecture matches runwayml/stable-diffusion-v1-5 /
Realistic_Vision_V4.0_noVAE (the reference's base model, reference:
configs/exp.yaml:110) so released torch checkpoints convert 1:1
(see gaussianip_tpu/diffusion/weights.py). Configurable widths/depths allow
tiny randomly-initialized instances for tests.

VCR (reference: ip_adapter/attention_processor_faceid.py:211-364 + layer
selection refine.py:702-712): the 9 up-block attn1 layers carry the
mutual-attention modes. The call takes `vcr_mode` (static) and a cache list
(one [B, S_l, D_l] array per VCR layer, or a pair for dense mode) and returns
the newly stored cache when mode == "store".
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .norm import FastGroupNorm

from .blocks import (
    Downsample,
    ResnetBlock,
    TimestepEmbedding,
    Transformer2D,
    Upsample,
    timestep_embedding,
)


@struct.dataclass
class UNetConfig:
    in_channels: int = struct.field(pytree_node=False, default=4)
    out_channels: int = struct.field(pytree_node=False, default=4)
    block_out_channels: tuple = struct.field(
        pytree_node=False, default=(320, 640, 1280, 1280))
    layers_per_block: int = struct.field(pytree_node=False, default=2)
    cross_attention_dim: int = struct.field(pytree_node=False, default=768)
    attention_head_dim: int = struct.field(pytree_node=False, default=8)
    norm_groups: int = struct.field(pytree_node=False, default=32)
    lora_rank: int = struct.field(pytree_node=False, default=0)
    ip_tokens: int = struct.field(pytree_node=False, default=0)
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)

    @property
    def n_vcr_layers(self) -> int:
        # attn1 layers in cross-attn up blocks (all but the first up block)
        return (len(self.block_out_channels) - 1) * (self.layers_per_block + 1)


def tiny_unet_config(**kw) -> UNetConfig:
    """Small random-init config for tests."""
    d = dict(block_out_channels=(32, 64), layers_per_block=1,
             cross_attention_dim=32, attention_head_dim=4, norm_groups=8)
    d.update(kw)
    return UNetConfig(**d)


def _heads(cfg: UNetConfig) -> int:
    return cfg.attention_head_dim


class UNet2DConditionModel(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample,  # [B, H, W, C] latents (NHWC)
        timesteps,  # [B] int
        encoder_hidden_states,  # [B, S, D_ctx]
        down_block_residuals: Optional[Sequence] = None,  # ControlNet adds
        mid_block_residual=None,
        ip_scale=1.0,
        vcr_mode: str = "off",  # static: off | store | key | dense
        vcr_cache=None,  # list per VCR layer (key: [B,S,D]; dense: pairs)
        vcr_weights=None,  # dense: {"w_l","w_r","lambda_self"}
    ):
        cfg = self.cfg
        chs = cfg.block_out_channels
        heads = _heads(cfg)
        n_down = len(chs)

        temb = timestep_embedding(timesteps, chs[0])
        temb = TimestepEmbedding(chs[0] * 4, dtype=cfg.dtype,
                                 name="time_embedding")(temb.astype(cfg.dtype))

        h = nn.Conv(chs[0], (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(
            sample.astype(cfg.dtype)
        )
        res_stack = [h]

        # down blocks: cross-attn on all but the last
        for bi, ch in enumerate(chs):
            has_attn = bi < n_down - 1
            for li in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_groups, dtype=cfg.dtype,
                                name=f"down_{bi}_res_{li}")(h, temb)
                if has_attn:
                    h, _ = Transformer2D(
                        ch, heads, cfg.cross_attention_dim,
                        lora_rank=cfg.lora_rank, ip_tokens=cfg.ip_tokens,
                        groups=cfg.norm_groups, dtype=cfg.dtype,
                        name=f"down_{bi}_attn_{li}",
                    )(h, encoder_hidden_states, ip_scale=ip_scale)
                res_stack.append(h)
            if bi < n_down - 1:
                h = Downsample(ch, dtype=cfg.dtype, name=f"down_{bi}_downsample")(h)
                res_stack.append(h)

        # mid
        h = ResnetBlock(chs[-1], cfg.norm_groups, dtype=cfg.dtype,
                        name="mid_res_0")(h, temb)
        h, _ = Transformer2D(
            chs[-1], heads, cfg.cross_attention_dim, lora_rank=cfg.lora_rank,
            ip_tokens=cfg.ip_tokens, groups=cfg.norm_groups, dtype=cfg.dtype,
            name="mid_attn",
        )(h, encoder_hidden_states, ip_scale=ip_scale)
        h = ResnetBlock(chs[-1], cfg.norm_groups, dtype=cfg.dtype,
                        name="mid_res_1")(h, temb)

        if down_block_residuals is not None:
            res_stack = [r + c for r, c in zip(res_stack, down_block_residuals)]
        if mid_block_residual is not None:
            h = h + mid_block_residual

        # up blocks (reversed channels); first has no attention
        new_cache = []
        vcr_idx = 0
        up_chs = list(reversed(chs))
        for bi, ch in enumerate(up_chs):
            has_attn = bi > 0
            for li in range(cfg.layers_per_block + 1):
                res = res_stack.pop()
                h = jnp.concatenate([h, res], axis=-1)
                h = ResnetBlock(ch, cfg.norm_groups, dtype=cfg.dtype,
                                name=f"up_{bi}_res_{li}")(h, temb)
                if has_attn:
                    vcr = None
                    if vcr_mode == "store":
                        vcr = {"mode": "store"}
                    elif vcr_mode == "key":
                        vcr = {"mode": "key", "src": vcr_cache[vcr_idx]}
                    elif vcr_mode == "dense":
                        vcr = {
                            "mode": "dense",
                            "src_l": vcr_cache[0][vcr_idx],
                            "src_r": vcr_cache[1][vcr_idx],
                            **vcr_weights,
                        }
                    h, stored = Transformer2D(
                        ch, heads, cfg.cross_attention_dim,
                        lora_rank=cfg.lora_rank, ip_tokens=cfg.ip_tokens,
                        groups=cfg.norm_groups, dtype=cfg.dtype,
                        name=f"up_{bi}_attn_{li}",
                    )(h, encoder_hidden_states, ip_scale=ip_scale, vcr=vcr)
                    if vcr_mode in ("store", "key"):
                        new_cache.append(stored)
                    vcr_idx += 1
            if bi < n_down - 1:
                h = Upsample(ch, dtype=cfg.dtype, name=f"up_{bi}_upsample")(h)

        h = FastGroupNorm(cfg.norm_groups, epsilon=1e-5, dtype=cfg.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        out = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                      name="conv_out")(h)
        if vcr_mode in ("store", "key"):
            return out, new_cache
        return out, None


class ControlNetModel(nn.Module):
    """ControlNet: the UNet's down+mid path with zero-initialized output
    convolutions and a conditioning-image embedding (lllyasviel
    control_v11p_sd15_openpose shape; reference: ipa_guidance.py:149-167)."""
    cfg: UNetConfig
    conditioning_channels: int = 3
    conditioning_embed_channels: tuple = (16, 32, 96, 256)

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, cond_image,
                 conditioning_scale=1.0, ip_scale=1.0):
        cfg = self.cfg
        chs = cfg.block_out_channels
        heads = _heads(cfg)
        n_down = len(chs)

        temb = timestep_embedding(timesteps, chs[0])
        temb = TimestepEmbedding(chs[0] * 4, dtype=cfg.dtype,
                                 name="time_embedding")(temb.astype(cfg.dtype))

        h = nn.Conv(chs[0], (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(
            sample.astype(cfg.dtype)
        )

        # conditioning embedding: stride-2 conv pyramid down to latent res,
        # zero-init final conv (diffusers ControlNetConditioningEmbedding)
        c = cond_image.astype(cfg.dtype)
        emb_chs = self.conditioning_embed_channels
        c = nn.silu(nn.Conv(emb_chs[0], (3, 3), padding=1, dtype=cfg.dtype,
                            name="cond_conv_in")(c))
        for i in range(len(emb_chs) - 1):
            c = nn.silu(nn.Conv(emb_chs[i], (3, 3), padding=1, dtype=cfg.dtype,
                                name=f"cond_conv_{2*i}")(c))
            c = nn.silu(nn.Conv(emb_chs[i + 1], (3, 3), strides=2,
                                padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                                name=f"cond_conv_{2*i+1}")(c))
        c = nn.Conv(chs[0], (3, 3), padding=1, dtype=cfg.dtype,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="cond_conv_out")(c)
        h = h + c

        down_res = [h]
        for bi, ch in enumerate(chs):
            has_attn = bi < n_down - 1
            for li in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_groups, dtype=cfg.dtype,
                                name=f"down_{bi}_res_{li}")(h, temb)
                if has_attn:
                    h, _ = Transformer2D(
                        ch, heads, cfg.cross_attention_dim,
                        groups=cfg.norm_groups, dtype=cfg.dtype,
                        name=f"down_{bi}_attn_{li}",
                    )(h, encoder_hidden_states, ip_scale=ip_scale)
                down_res.append(h)
            if bi < n_down - 1:
                h = Downsample(ch, dtype=cfg.dtype, name=f"down_{bi}_downsample")(h)
                down_res.append(h)

        h = ResnetBlock(chs[-1], cfg.norm_groups, dtype=cfg.dtype,
                        name="mid_res_0")(h, temb)
        h, _ = Transformer2D(
            chs[-1], heads, cfg.cross_attention_dim, groups=cfg.norm_groups,
            dtype=cfg.dtype, name="mid_attn",
        )(h, encoder_hidden_states, ip_scale=ip_scale)
        h = ResnetBlock(chs[-1], cfg.norm_groups, dtype=cfg.dtype,
                        name="mid_res_1")(h, temb)

        # zero convs
        out_res = []
        for i, r in enumerate(down_res):
            out_res.append(
                nn.Conv(r.shape[-1], (1, 1), dtype=cfg.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name=f"zero_conv_{i}")(r) * conditioning_scale
            )
        mid = nn.Conv(h.shape[-1], (1, 1), dtype=cfg.dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="zero_conv_mid")(h) * conditioning_scale
        return out_res, mid
