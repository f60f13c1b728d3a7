"""GroupNorm with a hand-written VJP, tuned for TPU memory layout.

The reference runs GroupNorm wherever diffusers does (VAE/UNet/ControlNet
resnet + attention norms; reference consumption:
threestudio/models/guidance/ipa_guidance.py:137,396-411 via diffusers).
XLA's autodiff of the naive group reshape is the single largest term of the
stage-1 VAE encode backward: at 512^2 NHWC activations the [B, H, W, G, C/G]
reshape leaves reductions with a 4..16-wide minor dimension, and the
derived backward re-materializes several f32 intermediates per layer —
measured 125 ms of the 204 ms VAE encode fwd+bwd (scripts/probe_vae.py full
204.4 vs nogn 78.9, TPU v5e, r4).

This implementation never builds the grouped layout:

  * statistics come from per-channel sums over the spatial axes ([B, C]
    arrays, lane dimension = C stays 128+), combined within each group on
    the tiny [B, C] array afterwards — sum(x) and sum(x^2) in one pass;
  * normalization is a single fused elementwise pass y = x * a + b with
    per-(batch, channel) a, b — XLA fuses it into the surrounding
    silu/conv;
  * the custom backward reduces dy and dy*x per channel (again [B, C]),
    then emits dx in ONE fused elementwise pass:
        dx = inv * (dy*gamma - mean_g(dy*gamma) - xhat * mean_g(dy*gamma*xhat))
    ~5 activation-sized passes total instead of XLA's derived graph.

Statistics are computed in float32 regardless of the activation dtype
(matching flax.linen.GroupNorm, which also promotes half-precision inputs
for mean/var). Channels are grouped consecutively (group = c // (C/G)),
matching both flax and torch.
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# A/B escape hatch: GIP_FLAX_GROUPNORM=1 routes every FastGroupNorm call
# through the naive grouped-layout formulation (XLA-derived VJP — the
# measured-slow baseline), with identical params/semantics. Used by
# scripts/probe_gnab.py to measure the custom VJP in context.
_USE_NAIVE = os.environ.get("GIP_FLAX_GROUPNORM", "0") == "1"


def _spatial_axes(ndim: int):
    return tuple(range(1, ndim - 1))


def _per_channel_to_group(s, groups: int):
    """[B, C] -> [B, G] by summing consecutive channel blocks."""
    b, c = s.shape
    return s.reshape(b, groups, c // groups).sum(axis=-1)


def _broadcast_cols(a, ndim: int):
    """[B, C] -> [B, 1, ..., 1, C] for an ndim-rank activation."""
    b, c = a.shape
    return a.reshape((b,) + (1,) * (ndim - 2) + (c,))


def _gn_stats(x, groups: int, eps: float):
    """float32 (mu, inv) per (batch, group), plus their per-channel
    broadcasts [B, C]."""
    b = x.shape[0]
    c = x.shape[-1]
    cg = c // groups
    n = x.size // (b * groups)
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=_spatial_axes(x.ndim))  # [B, C]
    s2 = jnp.sum(xf * xf, axis=_spatial_axes(x.ndim))
    gs1 = _per_channel_to_group(s1, groups)  # [B, G]
    gs2 = _per_channel_to_group(s2, groups)
    mu = gs1 / n
    var = gs2 / n - mu * mu
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    mu_c = jnp.repeat(mu, cg, axis=1)  # [B, C]
    inv_c = jnp.repeat(inv, cg, axis=1)
    return mu_c, inv_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm(x, gamma, beta, groups: int, eps: float):
    """y = (x - mean_g) * rsqrt(var_g + eps) * gamma + beta, channels-last,
    group statistics over (spatial..., channels-within-group)."""
    return _gn_fwd(x, gamma, beta, groups, eps)[0]


def _gn_fwd(x, gamma, beta, groups: int, eps: float):
    mu_c, inv_c = _gn_stats(x, groups, eps)
    gam = gamma.astype(jnp.float32)[None]  # [1, C]
    a = inv_c * gam  # [B, C]
    bb = beta.astype(jnp.float32)[None] - mu_c * a
    nd = x.ndim
    y = (x.astype(jnp.float32) * _broadcast_cols(a, nd)
         + _broadcast_cols(bb, nd)).astype(x.dtype)
    return y, (x, gamma, mu_c, inv_c)


def _gn_bwd(groups: int, eps: float, res, dy):
    x, gamma, mu_c, inv_c = res
    b = x.shape[0]
    c = x.shape[-1]
    n = x.size // (b * groups)
    nd = x.ndim
    axes = _spatial_axes(nd)
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    # one reduction pass over the activations -> [B, C]
    sd = jnp.sum(dyf, axis=axes)
    sdx = jnp.sum(dyf * xf, axis=axes)
    # parameter grads: dgamma = sum dy * xhat, dbeta = sum dy (over B too)
    dgamma = jnp.sum(inv_c * (sdx - mu_c * sd), axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(sd, axis=0).astype(gamma.dtype)
    # dx = inv * (g - mean(g) - xhat * mean(g * xhat)), g = dy * gamma.
    # All means are per (batch, group), derived from the [B, C] sums.
    gam = gamma.astype(jnp.float32)[None]  # [1, C]
    sg = _per_channel_to_group(sd * gam, groups)  # [B, G] sum g
    sgx = _per_channel_to_group(sdx * gam, groups)  # [B, G] sum g*x
    # mu/inv per group: mu_c repeats within the group; recover directly
    mu = mu_c.reshape(b, groups, c // groups)[:, :, 0]
    inv = inv_c.reshape(b, groups, c // groups)[:, :, 0]
    sgxh = inv * (sgx - mu * sg)  # sum g * xhat
    cg = c // groups
    m1_c = jnp.repeat(sg / n, cg, axis=1)  # [B, C] mean g
    m2_c = jnp.repeat(sgxh / n, cg, axis=1)  # [B, C] mean g*xhat
    # one fused elementwise pass
    xhat = (xf - _broadcast_cols(mu_c, nd)) * _broadcast_cols(inv_c, nd)
    dx = (_broadcast_cols(inv_c, nd)
          * (dyf * gam.reshape((1,) * (nd - 1) + (c,))
             - _broadcast_cols(m1_c, nd)
             - xhat * _broadcast_cols(m2_c, nd))).astype(x.dtype)
    return dx, dgamma, dbeta


group_norm.defvjp(_gn_fwd, _gn_bwd)


def _naive_group_norm(x, gamma, beta, groups: int, eps: float):
    """Grouped-reshape formulation with XLA-derived VJP (flax-equivalent
    math); the A/B baseline FastGroupNorm replaces."""
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    g = xf.reshape((b, -1, groups, c // groups))
    mu = g.mean(axis=(1, 3), keepdims=True)
    var = ((g - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    y = (g - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    return y.astype(x.dtype)


class FastGroupNorm(nn.Module):
    """Drop-in replacement for flax.linen.GroupNorm (same param names and
    shapes: 'scale'/'bias' [C] float32), channels-last inputs, custom VJP.

    `dtype` is accepted for call-site signature compatibility only: the
    output follows x.dtype (all call sites already feed activations at the
    module dtype, so the two conventions coincide); statistics are always
    float32, matching flax."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        assert c % self.num_groups == 0, (c, self.num_groups)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if _USE_NAIVE:
            return _naive_group_norm(x, scale, bias, self.num_groups,
                                     self.epsilon)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon)
