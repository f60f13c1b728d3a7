"""AutoencoderKL (SD VAE) in Flax, NHWC.

Matches stabilityai/sd-vae-ft-mse (the reference's VAE, reference:
configs/exp.yaml:118, ipa_guidance.py:137) so released torch weights convert
1:1. Provides encode (to scaled latents, sampling the posterior like the
reference's encode_images, ipa_guidance.py:522-531) and decode
(ipa_guidance.py:534-541).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .norm import FastGroupNorm

SD_VAE_SCALING = 0.18215


@struct.dataclass
class VAEConfig:
    block_out_channels: tuple = struct.field(
        pytree_node=False, default=(128, 256, 512, 512))
    layers_per_block: int = struct.field(pytree_node=False, default=2)
    latent_channels: int = struct.field(pytree_node=False, default=4)
    norm_groups: int = struct.field(pytree_node=False, default=32)
    scaling_factor: float = struct.field(pytree_node=False, default=SD_VAE_SCALING)
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)


def tiny_vae_config(**kw) -> VAEConfig:
    d = dict(block_out_channels=(16, 32), layers_per_block=1, norm_groups=8)
    d.update(kw)
    return VAEConfig(**d)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = FastGroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = FastGroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = FastGroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        # shared dispatcher: at 128^2 latents (16384 tokens) the full
        # single-head score matrix is GBs — goes through the chunked path
        from .blocks import _attend

        o = _attend(q, k, v, heads=1)
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        chs = cfg.block_out_channels
        h = nn.Conv(chs[0], (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(x)
        for bi, ch in enumerate(chs):
            for li in range(cfg.layers_per_block):
                h = VAEResnet(ch, cfg.norm_groups, cfg.dtype,
                              name=f"down_{bi}_res_{li}")(h)
            if bi < len(chs) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=((0, 1), (0, 1)),
                            dtype=cfg.dtype, name=f"down_{bi}_downsample")(h)
        h = VAEResnet(chs[-1], cfg.norm_groups, cfg.dtype, name="mid_res_0")(h)
        h = VAEAttention(cfg.norm_groups, cfg.dtype, name="mid_attn")(h)
        h = VAEResnet(chs[-1], cfg.norm_groups, cfg.dtype, name="mid_res_1")(h)
        h = FastGroupNorm(cfg.norm_groups, epsilon=1e-6, dtype=cfg.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=cfg.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        chs = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(chs[0], (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(z)
        h = VAEResnet(chs[0], cfg.norm_groups, cfg.dtype, name="mid_res_0")(h)
        h = VAEAttention(cfg.norm_groups, cfg.dtype, name="mid_attn")(h)
        h = VAEResnet(chs[0], cfg.norm_groups, cfg.dtype, name="mid_res_1")(h)
        for bi, ch in enumerate(chs):
            for li in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, cfg.norm_groups, cfg.dtype,
                              name=f"up_{bi}_res_{li}")(h)
            if bi < len(chs) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype,
                            name=f"up_{bi}_upsample")(h)
        h = FastGroupNorm(cfg.norm_groups, epsilon=1e-6, dtype=cfg.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=cfg.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.cfg.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.cfg.dtype)

    def encode_moments(self, images):
        """images [B, H, W, 3] in [-1, 1] -> (mean, logvar) latents NHWC."""
        m = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(m, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images, key=None):
        """-> scaled latents; samples the posterior when key given
        (the reference's encode_images samples, ipa_guidance.py:529-530)."""
        mean, logvar = self.encode_moments(images)
        z = mean
        if key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, mean.dtype
            )
        return z * self.cfg.scaling_factor

    def decode(self, latents):
        """scaled latents -> images [B, H, W, 3] in [-1, 1]."""
        z = self.post_quant_conv(latents / self.cfg.scaling_factor)
        return self.decoder(z)

    def __call__(self, images, key=None):
        return self.decode(self.encode(images, key))
