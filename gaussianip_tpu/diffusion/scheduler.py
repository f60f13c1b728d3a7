"""DDIM scheduler math (pure JAX).

Replaces the diffusers DDIMScheduler the reference configures (reference:
threestudio/models/guidance/ipa_guidance.py:139-147): 1000 train timesteps,
scaled_linear betas 0.00085 -> 0.012, clip_sample=False, set_alpha_to_one=
False, steps_offset=1. Provides add_noise (forward diffusion) and the DDIM
update used by the stage-2 refinement's partial denoise
(reference: models/pipeline_ipa_controlnet.py:1766-1830).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DDIMSchedule(NamedTuple):
    betas: jnp.ndarray  # [T]
    alphas_cumprod: jnp.ndarray  # [T]
    final_alpha_cumprod: jnp.ndarray  # scalar
    num_train_timesteps: int


def make_ddim_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    set_alpha_to_one: bool = False,
) -> DDIMSchedule:
    # scaled_linear: betas are squared-interpolated sqrt endpoints
    betas = (
        jnp.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps) ** 2
    ).astype(jnp.float32)
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    final = jnp.float32(1.0) if set_alpha_to_one else alphas_cumprod[0]
    return DDIMSchedule(betas, alphas_cumprod, final, num_train_timesteps)


def add_noise(sched: DDIMSchedule, sample, noise, t):
    """x_t = sqrt(a_t) x_0 + sqrt(1 - a_t) eps; t: int array broadcastable to
    sample's batch."""
    a = sched.alphas_cumprod[t]
    shape = (-1,) + (1,) * (sample.ndim - 1)
    sa = jnp.sqrt(a).reshape(shape)
    s1a = jnp.sqrt(1.0 - a).reshape(shape)
    return sa * sample + s1a * noise


def ddim_step(sched: DDIMSchedule, model_output, t, prev_t, sample, eta: float = 0.0):
    """Deterministic DDIM update x_t -> x_{t_prev} (eta=0, no thresholding,
    epsilon prediction — the reference pipeline's configuration)."""
    shape = (-1,) + (1,) * (sample.ndim - 1)
    a_t = sched.alphas_cumprod[t].reshape(shape)
    a_prev = jnp.where(
        prev_t >= 0, sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
        sched.final_alpha_cumprod,
    ).reshape(shape)
    pred_x0 = (sample - jnp.sqrt(1.0 - a_t) * model_output) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev) * model_output
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt


def refine_timestep_ladder(num_inference_steps: int = 50,
                           num_train_timesteps: int = 1000):
    """The stage-2 ladder: linspace(0, 999, 50).round(), descending
    (reference: refine.py:181-183)."""
    t = jnp.linspace(0, num_train_timesteps - 1, num_inference_steps)
    return jnp.round(t).astype(jnp.int32)[::-1]
