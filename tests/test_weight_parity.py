"""Numerical weight-converter parity: torch (diffusers layout) vs Flax.

The full real-launch loop: a torch model whose state_dict() has the exact
diffusers key layout is saved to a REAL checkpoint file on disk
(.safetensors / torch .bin), loaded back through weights.load_torch_state_dict
and the convert_* mappings, and the Flax forward must match the recorded
torch forward on the same inputs. This validates the conversion conventions
numerically (Linear/Conv transposes, GroupNorm grouping, SDPA head reshape
order, GEGLU split order, NHWC, asymmetric VAE downsample pad, LoRA
processor numbering down->up->mid) — the failure modes a structural
round-trip test cannot catch (reference model load: ipa_guidance.py:127-198).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gaussianip_tpu.diffusion import weights
from gaussianip_tpu.diffusion.torch_mirror import (
    AutoencoderKLPT,
    ControlNetModelPT,
    UNet2DConditionModelPT,
)
from gaussianip_tpu.diffusion.unet import (
    ControlNetModel,
    UNet2DConditionModel,
    UNetConfig,
)
from gaussianip_tpu.diffusion.vae import AutoencoderKL, VAEConfig

CHS = (32, 64)
CTX = 32
HEADS = 4
GROUPS = 8


def _save_safetensors(sd, path):
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in sd.items()}, str(path))


def test_unet_parity_through_disk(tmp_path):
    torch.manual_seed(0)
    pt = UNet2DConditionModelPT(CHS, 1, CTX, HEADS, GROUPS, lora_rank=4,
                                ip_tokens=2).eval()
    sd, ipa = pt.export_state_dict()
    p_unet = tmp_path / "unet.safetensors"
    p_ipa = tmp_path / "ipa.bin"
    _save_safetensors(sd, p_unet)
    torch.save({"ip_adapter": ipa}, str(p_ipa))

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 16, 16, 4)).astype(np.float32)
    ts = np.array([3, 500], np.int64)
    ctx = rng.normal(0, 1, (2, 10, CTX)).astype(np.float32)

    with torch.no_grad():
        ref = pt(torch.from_numpy(x).permute(0, 3, 1, 2),
                 torch.from_numpy(ts),
                 torch.from_numpy(ctx)).permute(0, 2, 3, 1).numpy()

    loaded = weights.load_torch_state_dict(str(p_unet))
    ipa_loaded = weights.load_torch_state_dict(str(p_ipa))["ip_adapter"]
    ipa_np = {k: np.asarray(v.detach().float().numpy()
                            if hasattr(v, "detach") else v)
              for k, v in ipa_loaded.items()}
    params = weights.convert_unet(loaded, CHS, 1, ipa_state=ipa_np)

    cfg = UNetConfig(block_out_channels=CHS, layers_per_block=1,
                     cross_attention_dim=CTX, attention_head_dim=HEADS,
                     norm_groups=GROUPS, lora_rank=4, ip_tokens=2)
    out, _ = UNet2DConditionModel(cfg).apply(
        params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(ctx))
    err = np.max(np.abs(np.asarray(out) - ref))
    assert err < 3e-4, f"UNet parity failed: max err {err}"


def test_vae_parity_through_disk(tmp_path):
    torch.manual_seed(1)
    pt = AutoencoderKLPT((16, 32), 1, latent_channels=4, groups=8).eval()
    p = tmp_path / "vae.safetensors"
    _save_safetensors(pt.state_dict(), p)

    rng = np.random.default_rng(1)
    img = rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32)
    lat = rng.normal(0, 1, (2, 8, 8, 4)).astype(np.float32)
    with torch.no_grad():
        m_ref = pt.encode_moments(
            torch.from_numpy(img).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()
        d_ref = pt.decode(
            torch.from_numpy(lat).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()

    params = weights.convert_vae(
        weights.load_torch_state_dict(str(p)), (16, 32), 1)
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                    norm_groups=8)
    vae = AutoencoderKL(cfg)
    mean, logvar = vae.apply(params, jnp.asarray(img),
                             method=AutoencoderKL.encode_moments)
    m = jnp.concatenate([mean, logvar], axis=-1)
    # decode() takes scaled latents; the torch mirror decodes raw z
    d = vae.apply(params, jnp.asarray(lat) * cfg.scaling_factor,
                  method=AutoencoderKL.decode)
    em = np.max(np.abs(np.asarray(m) - m_ref))
    ed = np.max(np.abs(np.asarray(d) - d_ref))
    assert em < 3e-4, f"VAE encode parity: {em}"
    assert ed < 3e-4, f"VAE decode parity: {ed}"


def test_controlnet_parity_through_disk(tmp_path):
    torch.manual_seed(2)
    pt = ControlNetModelPT(CHS, 1, CTX, HEADS, GROUPS,
                           conditioning_embed_channels=(8, 16)).eval()
    p = tmp_path / "cn.safetensors"
    _save_safetensors(pt.state_dict(), p)

    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 8, 8, 4)).astype(np.float32)
    ts = np.array([7, 300], np.int64)
    ctx = rng.normal(0, 1, (2, 10, CTX)).astype(np.float32)
    cond = rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        res_ref, mid_ref = pt(torch.from_numpy(x).permute(0, 3, 1, 2),
                              torch.from_numpy(ts), torch.from_numpy(ctx),
                              torch.from_numpy(cond).permute(0, 3, 1, 2),
                              scale=0.7)
        res_ref = [r.permute(0, 2, 3, 1).numpy() for r in res_ref]
        mid_ref = mid_ref.permute(0, 2, 3, 1).numpy()

    params = weights.convert_controlnet(
        weights.load_torch_state_dict(str(p)), CHS, 1,
        conditioning_embed_channels=(8, 16))
    cfg = UNetConfig(block_out_channels=CHS, layers_per_block=1,
                     cross_attention_dim=CTX, attention_head_dim=HEADS,
                     norm_groups=GROUPS)
    res, mid = ControlNetModel(cfg, conditioning_embed_channels=(8, 16)).apply(
        params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(ctx),
        jnp.asarray(cond), conditioning_scale=0.7)
    assert len(res) == len(res_ref)
    for i, (a, b) in enumerate(zip(res, res_ref)):
        e = np.max(np.abs(np.asarray(a) - b))
        assert e < 3e-4, f"controlnet residual {i} parity: {e}"
    em = np.max(np.abs(np.asarray(mid) - mid_ref))
    assert em < 3e-4, f"controlnet mid parity: {em}"
