"""Full-pipeline assembly: build/load the diffusion stack and run the
three-stage avatar optimization.

This is the glue the reference spreads across launch.py + GaussianIP.py +
ipa_guidance.py + refine.py (reference: SURVEY.md §3 call stacks), rebuilt
without PyTorch-Lightning: plain functions over explicit state, one run
directory with a manifest instead of mutated config files.

Model weights load from the same released checkpoints the reference
downloads (configs/exp.yaml:90-118 paths). When they are absent the
pipeline runs in --stub mode (random tiny models / fake guidance) — the
BASELINE smoke configuration."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import gaussianip_tpu as gt

from ..data.sampler import CameraSamplerConfig
from ..diffusion.unet import ControlNetModel, UNet2DConditionModel, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig
from ..guidance.ipa import (
    AHDSGuidance,
    GuidanceConfig,
    GuidanceModels,
    ImageEmbeds,
)
from ..guidance.prompts import fake_text_encoder, make_prompt_embeddings
from ..model.adam import AdamHyper
from ..render.render import RenderConfig


def sd15_unet_config(lora_rank=128, ip_tokens=4, dtype=jnp.bfloat16):
    return UNetConfig(lora_rank=lora_rank, ip_tokens=ip_tokens, dtype=dtype)


def load_real_models(cfg_guidance: dict, dtype=jnp.bfloat16) -> GuidanceModels:
    """Load UNet/ControlNet/VAE from the configured checkpoint paths
    (diffusers layout). Raises with a clear message when absent."""
    from ..diffusion import weights as W

    def find_sd(base, *names):
        for n in names:
            for ext in (".safetensors", ".bin"):
                p = os.path.join(base, n + ext)
                if os.path.exists(p):
                    return W.load_torch_state_dict(p)
        raise FileNotFoundError(
            f"no checkpoint under {base} (tried {names}); run with "
            f"--stub-guidance for a weight-free smoke run"
        )

    # the IPA LoRA adapters (rank 128 on every attention projection,
    # reference ip_adapter_faceid.py:286-329) run at a STATIC scale, so
    # they fold exactly into the base kernels at load time: the runtime
    # UNet is lora_rank=0 and skips 8 low-rank matmuls per attention block
    # (at rank 128 the adapters cost 1.6x the base projection FLOPs on the
    # 320-wide level-0 blocks — the denoise hot path)
    ucfg = sd15_unet_config(lora_rank=0, dtype=dtype)
    unet = UNet2DConditionModel(ucfg)
    base = cfg_guidance["pretrained_realistic_model_name_or_path"]
    usd = find_sd(os.path.join(base, "unet"), "diffusion_pytorch_model")
    ipa_sd = None
    ipa_path = cfg_guidance.get("ip_ckpt_faceid_v2_path", "")
    if ipa_path and os.path.exists(ipa_path):
        full = W.load_torch_state_dict(ipa_path)
        ipa_sd = {k: np.asarray(v) for k, v in full["ip_adapter"].items()} \
            if "ip_adapter" in full else None
    unet_params = W.fold_lora(W.convert_unet(usd, ipa_state=ipa_sd))

    vcfg = VAEConfig(dtype=dtype)
    vae = AutoencoderKL(vcfg)
    vsd = find_sd(cfg_guidance["vae_path"], "diffusion_pytorch_model")
    vae_params = W.convert_vae(vsd)

    cn = ControlNetModel(sd15_unet_config(lora_rank=0, ip_tokens=0, dtype=dtype))
    csd = find_sd(cfg_guidance["pose_controlnet_path"], "diffusion_pytorch_model")
    cn_params = W.convert_controlnet(csd)

    # commit params to the accelerator EXPLICITLY: numpy/CPU-committed trees
    # passed to jitted fns get re-shipped host->device on every call.
    # Params stay f32 (compute runs at `dtype`=bf16): bf16-cast params
    # MEASURED ~25 ms/step SLOWER on the stage-1 step (r5: 444.8/448.1
    # f32 vs 467.2/471.2 bf16) and f32 fits HBM in every stage next to
    # the refine's capped attention budget (scripts/probe_refinemem.py)
    dev = jax.devices()[0]
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a, jnp.float32), dev), t)
    return GuidanceModels(unet, cast(unet_params), cn, cast(cn_params),
                          vae, cast(vae_params))


def load_text_encoder(model_path: str):
    """CLIP text encoder through transformers Flax (from_pt converts the
    torch weights). Returns encode(list[str]) -> [N, 77, 768]."""
    from transformers import CLIPTokenizer, FlaxCLIPTextModel

    tok = CLIPTokenizer.from_pretrained(os.path.join(model_path, "tokenizer"))
    enc = FlaxCLIPTextModel.from_pretrained(
        os.path.join(model_path, "text_encoder"), from_pt=True
    )

    def encode(prompts):
        ids = tok(prompts, padding="max_length", max_length=77,
                  truncation=True, return_tensors="np").input_ids
        return np.asarray(enc(ids).last_hidden_state)

    return encode


def load_image_encoder(model_path: str):
    """CLIP-ViT-H vision tower; returns penultimate hidden states
    [N, 257, 1280] from [N, 224, 224, 3] in [0, 1]."""
    from transformers import FlaxCLIPVisionModel

    enc = FlaxCLIPVisionModel.from_pretrained(model_path, from_pt=True)
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def encode_hidden(images):
        x = (np.asarray(images, np.float32) - mean) / std
        x = x.transpose(0, 3, 1, 2)  # CLIP vision expects NCHW pixel_values
        out = enc(x, output_hidden_states=True)
        return np.asarray(out.hidden_states[-2])

    return encode_hidden


def face_identity(image_path: str, irr_image_path: str):
    """Face detect + ArcFace embed + aligned 224^2 crop (reference:
    ipa_guidance.py:236-248 via insightface). Falls back to a deterministic
    center-crop + image-statistics embedding when insightface/onnxruntime
    are unavailable (smoke-quality identity only)."""
    try:
        import cv2
        from insightface.app import FaceAnalysis
        from insightface.utils import face_align

        app = FaceAnalysis(name="buffalo_l",
                           providers=["CPUExecutionProvider"])
        app.prepare(ctx_id=0, det_size=(640, 640))

        def embed(p):
            img = cv2.imread(p)
            faces = app.get(img)
            e = faces[0].normed_embedding
            crop = face_align.norm_crop(img, landmark=faces[0].kps,
                                        image_size=224)
            return np.asarray(e, np.float32)[None], (
                crop[..., ::-1].astype(np.float32) / 255.0)[None]

        return embed(image_path), embed(irr_image_path)
    except Exception:
        gt.warn("insightface unavailable — using fallback face identity "
                "(center crop + image-hash embedding); identity preservation "
                "quality will be reduced")
        from PIL import Image

        def embed(p):
            img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
            h, w = img.shape[:2]
            s = min(h, w)
            crop = img[(h - s) // 2 : (h + s) // 2, (w - s) // 2 : (w + s) // 2]
            crop224 = np.asarray(
                Image.fromarray((crop * 255).astype(np.uint8)).resize((224, 224)),
                np.float32) / 255.0
            rng = np.random.default_rng(
                abs(hash(p + str(float(img.mean())))) % (2 ** 31))
            e = rng.normal(size=(512,)).astype(np.float32)
            e /= np.linalg.norm(e)
            return e[None], crop224[None]

        return embed(image_path), embed(irr_image_path)


def load_lpips(sys_cfg: dict):
    """Stage-3 perceptual loss (reference: GaussianIP.py:121,434-436 —
    lpips.LPIPS(net='vgg')). Loads the torchvision VGG16 + lpips linear-head
    checkpoints from `lpips_vgg_path` / `lpips_lin_path` (torch state dicts)
    and returns a differentiable `fn(x, y) -> [B]`, or None with a LOUD
    warning when the weights are not configured/present — stage 3 then
    trains L1-only, which the reference never does."""
    from ..diffusion.lpips import LPIPS, convert_lpips_weights
    from ..diffusion.weights import load_torch_state_dict

    vgg_path = sys_cfg.get("lpips_vgg_path", "")
    lin_path = sys_cfg.get("lpips_lin_path", "")
    if not (vgg_path and lin_path and os.path.exists(vgg_path)
            and os.path.exists(lin_path)):
        gt.warn(
            "=" * 70 + "\nLPIPS weights not found (system.lpips_vgg_path / "
            "system.lpips_lin_path): stage 3 will train with L1 ONLY. The "
            "reference optimizes 10*L1 + 15*LPIPS (GaussianIP.py:432-436) — "
            "supply the torchvision vgg16 and lpips vgg linear checkpoints "
            "for quality parity.\n" + "=" * 70)
        return None
    vgg_sd = load_torch_state_dict(vgg_path)
    lin_sd = load_torch_state_dict(lin_path)
    params = convert_lpips_weights(vgg_sd, lin_sd)
    params = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), jax.devices()[0]), params)
    model = LPIPS()

    def fn(x, y):
        return model.apply(params, x, y, normalize=True)

    return fn


def build_stub_guidance_stack(prompt: str, negative_prompt: str,
                              image_size: int = 64):
    """Tiny random models + fake text encoder: the weight-free smoke stack
    (fills the reference's missing fake-backend role)."""
    from ..diffusion.unet import tiny_unet_config
    from ..diffusion.vae import tiny_vae_config

    from ..utils.fast_init import fast_init

    ucfg = tiny_unet_config(ip_tokens=4)
    unet = UNet2DConditionModel(ucfg)
    cn = ControlNetModel(ucfg, conditioning_embed_channels=(8, 16))
    vae = AutoencoderKL(tiny_vae_config())
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, image_size // 2, image_size // 2, 4))
    ctx = jnp.zeros((1, 81, 32))
    # shape-only init: Module.init would XLA-compile a real forward (~80 s
    # on CPU for this stack)
    up = fast_init(unet, key, lat, jnp.array([1]), ctx)
    cp = fast_init(cn, key, lat, jnp.array([1]), ctx[:, :77],
                   jnp.zeros((1, image_size, image_size, 3)))
    vp = fast_init(vae, key, jnp.zeros((1, image_size, image_size, 3)))
    models = GuidanceModels(unet, up, cn, cp, vae, vp)
    pe = make_prompt_embeddings(fake_text_encoder(77, 32), prompt,
                                negative_prompt, "")
    img = ImageEmbeds(
        pos=jnp.full((1, 4, 32), 0.01), null=jnp.zeros((1, 4, 32)),
        neg=jnp.zeros((1, 4, 32)),
    )
    gcfg = GuidanceConfig(image_size=image_size,
                          latent_size=image_size // 2)
    return AHDSGuidance(models, pe, img, gcfg)
