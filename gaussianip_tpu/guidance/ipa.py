"""The full AHDS/ANPG diffusion guidance (the reference's ipa-guidance).

Functional rebuild of reference threestudio/models/guidance/ipa_guidance.py
(StableDiffusionGuidance): VAE-encode the rendered views, draw AHDS-windowed
timesteps, run ControlNet + UNet once on the 3-way CFG batch
[neg, pos, null] x B with view-dependent text + identity image tokens, form
the ANPG gradient, and return the SDS-shaped loss whose latent gradient is
that gradient. Everything is a pure function of (params, inputs, key) and
jit/differentiates through the VAE encode only (the UNet pass is under
stop_gradient, as the reference wraps it in no_grad, ipa_guidance.py:391).

Conditioning precompute (prepare_for_sds equivalent,
ipa_guidance.py:236-307): identity tokens from ProjPlus(face-ID embed, CLIP
hidden states) for (real face, irrelevant face, zeros) are concatenated onto
the 77-token text embeddings -> 77 + 4 tokens.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..diffusion.scheduler import DDIMSchedule, add_noise, make_ddim_schedule
from .ahds import (
    AHDSSchedule,
    anpg_grad,
    make_ahds_schedule,
    sample_timesteps,
    sds_grad,
    sds_loss,
)
from .prompts import PromptEmbeddings


@struct.dataclass
class GuidanceConfig:
    guidance_scale: float = 7.5
    guidance_rescale: float = 0.75
    ipa_scale: float = 0.5  # ipa_faceid_scale (configs/exp.yaml:96)
    weighting_strategy: str = struct.field(pytree_node=False, default="sds")
    use_anpg: bool = struct.field(pytree_node=False, default=True)
    use_pose_controlnet: bool = struct.field(pytree_node=False, default=True)
    view_dependent_prompting: bool = struct.field(pytree_node=False, default=True)
    grad_clip_pixel: bool = struct.field(pytree_node=False, default=True)
    grad_clip_threshold: float = 1.0
    head_offset: float = 0.65
    latent_size: int = struct.field(pytree_node=False, default=64)
    image_size: int = struct.field(pytree_node=False, default=512)


class ImageEmbeds(NamedTuple):
    pos: jnp.ndarray  # [1, T_ip, D]
    null: jnp.ndarray
    neg: jnp.ndarray


class GuidanceModels(NamedTuple):
    """Bundles modules + params (all flax linen)."""
    unet: Any
    unet_params: Any
    controlnet: Any
    controlnet_params: Any
    vae: Any
    vae_params: Any


class AHDSGuidance:
    """Callable guidance compatible with system/stage1.make_train_step."""

    def __init__(
        self,
        models: GuidanceModels,
        prompt_embeds: PromptEmbeddings,
        image_embeds: Optional[ImageEmbeds],
        cfg: GuidanceConfig = GuidanceConfig(),
        ddim: Optional[DDIMSchedule] = None,
        ahds: Optional[AHDSSchedule] = None,
    ):
        self.models = models
        self.prompt_embeds = prompt_embeds
        self.image_embeds = image_embeds
        self.cfg = cfg
        self.ddim = ddim or make_ddim_schedule()
        self.ahds = ahds or make_ahds_schedule()

    @property
    def jit_params(self):
        """Model weights as a pytree for threading through jit as ARGUMENTS
        (closed-over multi-GB params bake into the lowered graph as
        constants and stall the remote compiler — NOTES gotcha #2)."""
        m = self.models
        return (m.unet_params, m.controlnet_params, m.vae_params)

    def with_params(self, p):
        """Rebind the (possibly traced) param pytree from `jit_params`."""
        m = self.models._replace(
            unet_params=p[0], controlnet_params=p[1], vae_params=p[2])
        return AHDSGuidance(m, self.prompt_embeds, self.image_embeds,
                            self.cfg, self.ddim, self.ahds)

    def _context(self, view_aux, batch_size):
        """[3B, S(+T_ip), D] stacked (pos, neg, null) conditioning."""
        text = self.prompt_embeds.get_text_embeddings(
            view_aux["elevation"], view_aux["azimuth"], view_aux["center"],
            view_aux["all_vis"], view_aux["camera_distances"],
            view_dependent=self.cfg.view_dependent_prompting,
            head_offset=self.cfg.head_offset,
        )  # [3B, S, D] order (pos, neg, null)
        if self.image_embeds is None:
            return text
        b = batch_size
        rep = lambda e: jnp.broadcast_to(e, (b,) + e.shape[1:])
        img = jnp.concatenate(
            [rep(self.image_embeds.pos), rep(self.image_embeds.neg),
             rep(self.image_embeds.null)], axis=0,
        )  # [3B, T_ip, D], matching (pos, neg, null) text order
        return jnp.concatenate([text, img], axis=1)

    def encode_images(self, rgb_bhwc, key):
        """[B, H, W, 3] in [0, 1] -> scaled latents [B, h, w, 4]
        (reference: ipa_guidance.py:522-531)."""
        size = self.cfg.image_size
        x = jax.image.resize(
            rgb_bhwc, (rgb_bhwc.shape[0], size, size, 3), "linear"
        )
        x = x * 2.0 - 1.0
        return self.models.vae.apply(
            self.models.vae_params, x, key, method=self.models.vae.encode
        )

    def predict_noise(self, latents_noisy, control_img, t, context):
        """One ControlNet+UNet pass on an already-expanded batch."""
        m = self.models
        if self.cfg.use_pose_controlnet:
            down_res, mid = m.controlnet.apply(
                m.controlnet_params, latents_noisy, t, context, control_img,
                conditioning_scale=1.0,
            )
        else:
            down_res, mid = None, None
        out, _ = m.unet.apply(
            m.unet_params, latents_noisy, t, context,
            down_block_residuals=down_res, mid_block_residual=mid,
            ip_scale=self.cfg.ipa_scale,
        )
        return out

    def __call__(self, step, key, rgb, control_img, view_aux):
        cfg = self.cfg
        b = rgb.shape[0]
        k_t, k_noise, k_vae = jax.random.split(key, 3)

        latents = self.encode_images(rgb, k_vae)
        t = sample_timesteps(self.ahds, k_t, step, b)

        size = cfg.image_size
        control = jax.image.resize(control_img, (b, size, size, 3), "linear")

        def no_grad_noise(latents):
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
            latents_noisy = add_noise(self.ddim, latents, noise, t)
            n_way = 3 if cfg.use_anpg else 2
            lat_in = jnp.concatenate([latents_noisy] * n_way, axis=0)
            ctrl_in = jnp.concatenate([control] * n_way, axis=0)
            t_in = jnp.concatenate([t] * n_way, axis=0)
            context = self._context(view_aux, b)
            if not cfg.use_anpg:
                # (pos, neg) only
                context = context[: 2 * b]
            pred = self.predict_noise(lat_in, ctrl_in, t_in, context)
            if cfg.use_anpg:
                e_pos, e_neg, e_null = jnp.split(pred, 3, axis=0)
                grad = anpg_grad(
                    e_neg, e_pos, e_null, t, self.ddim.alphas_cumprod,
                    cfg.guidance_scale, cfg.weighting_strategy,
                    cfg.grad_clip_pixel, cfg.grad_clip_threshold,
                )
            else:
                e_pos, e_neg = jnp.split(pred, 2, axis=0)
                grad = sds_grad(
                    e_neg, e_pos, noise, t, self.ddim.alphas_cumprod,
                    cfg.guidance_scale, cfg.weighting_strategy,
                    cfg.guidance_rescale,
                )
            return grad

        grad = jax.lax.stop_gradient(no_grad_noise(jax.lax.stop_gradient(latents)))
        loss = sds_loss(latents, grad)
        return {
            "loss_sds": loss,
            "grad_norm": jnp.linalg.norm(grad),
            "t_mean": jnp.mean(t.astype(jnp.float32)),
        }


def compute_image_embeds(
    proj_model, proj_params,
    pos_id_embed, irr_id_embed,
    pos_clip_hidden, irr_clip_hidden, zero_clip_hidden,
    s_scale: float = 0.4, shortcut: bool = True,
) -> ImageEmbeds:
    """ProjPlus triple: (real, irrelevant, zeros) -> (pos, null, neg) tokens
    (reference: ip_adapter_faceid.py:363-382)."""
    run = lambda ide, ch: proj_model.apply(
        proj_params, ide, ch, shortcut=shortcut, scale=s_scale
    )
    pos = run(pos_id_embed, pos_clip_hidden)
    null = run(irr_id_embed, irr_clip_hidden)
    neg = run(jnp.zeros_like(pos_id_embed), zero_clip_hidden)
    return ImageEmbeds(pos=pos, null=null, neg=neg)
