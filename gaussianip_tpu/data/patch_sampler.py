"""Random mask-guided patch cropping (reference: utils/sampler.py — random
patch crops centered on foreground pixels, used by the experimental avatar
losses). Jittable with static patch sizes."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("patch_size", "num_patches"))
def sample_patches(key, image, mask, patch_size: int, num_patches: int):
    """Crop `num_patches` patches of `patch_size` whose centers land on
    foreground (mask > 0.5) pixels when any exist.

    image: [H, W, C]; mask: [H, W]. Returns patches [N, P, P, C] and the
    top-left corners [N, 2]."""
    h, w = mask.shape
    half = patch_size // 2
    flat = mask.reshape(-1)
    probs = jnp.where(flat > 0.5, 1.0, 0.0)
    has_fg = jnp.sum(probs) > 0
    probs = jnp.where(has_fg, probs, jnp.ones_like(probs))
    probs = probs / jnp.sum(probs)
    idx = jax.random.choice(key, h * w, (num_patches,), p=probs)
    cy = jnp.clip(idx // w, half, h - patch_size + half)
    cx = jnp.clip(idx % w, half, w - patch_size + half)
    y0 = cy - half
    x0 = cx - half

    def crop(y, x):
        return jax.lax.dynamic_slice(
            image, (y, x, 0), (patch_size, patch_size, image.shape[-1])
        )

    patches = jax.vmap(crop)(y0, x0)
    return patches, jnp.stack([y0, x0], -1)
