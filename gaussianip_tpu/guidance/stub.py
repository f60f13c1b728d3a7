"""Stub guidance: a fake score-distillation signal for integration tests and
smoke runs without the 4 GB diffusion stack (fills the reference's missing
fake-backend role, SURVEY.md §4). Interface-compatible with the real AHDS
guidance (gaussianip_tpu/guidance/ahds.py).

The SDS loss shape mirrors the reference exactly (reference:
threestudio/models/guidance/ipa_guidance.py:641-653):
    target = stop_grad(latents - grad)
    loss   = 0.5 * ||latents - target||^2 / B
with `grad` here just noise decayed toward a fixed target image, so the
optimization visibly converges in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_stub_guidance(target_rgb=None, noise_scale=0.1):
    """target_rgb: optional [H', W', 3] image the fake score pulls toward."""

    def guidance(step, key, rgb, control_img, view_aux):
        b = rgb.shape[0]
        if target_rgb is not None:
            tgt = jax.image.resize(
                target_rgb, (rgb.shape[1], rgb.shape[2], 3), "linear"
            )[None]
            grad = rgb - tgt
        else:
            grad = jnp.zeros_like(rgb)
        grad = grad + noise_scale * jax.random.normal(key, rgb.shape)
        target = jax.lax.stop_gradient(rgb - grad)
        loss_sds = 0.5 * jnp.sum((rgb - target) ** 2) / b
        return {"loss_sds": loss_sds, "grad_norm": jnp.linalg.norm(grad)}

    return guidance
