"""Converter parity at REAL SD1.5 scale (VERDICT r3 item 7).

The gated checkpoints are absent from this environment, so this runs the
same through-disk record/compare loop as tests/test_weight_parity.py but at
the PRODUCTION topology and shapes the launch path uses (reference model
load: ipa_guidance.py:127-198):

  * UNet 320/640/1280/1280, layers 2, ctx 768, LoRA rank 128, 4 IP tokens,
    64x64 latents, 77+4 context tokens (the IPA prompt layout);
  * VAE 128/256/512/512 encode@256^2 + decode->256^2;
  * ControlNet full widths, 512^2 openpose cond image;
  * transformers from_pt CLIP: ViT-H/14 vision tower (1280 wide, 32 layers,
    penultimate hidden states — pipeline.load_image_encoder's exact call)
    and the SD1.5 text encoder (768 wide, 12 layers, 77 tokens).

Weights are torch-random-initialized mirrors with the exact diffusers
state-dict layout; activations at these widths exercise every converted
tensor at its production shape. Prints a max-abs-error table (check into
NOTES.md). Runs on CPU; ~20-40 min single-core. Usage:

    python scripts/weight_parity_fullscale.py [unet|vae|controlnet|clip ...]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS = []


def row(name, shape, err, tol=5e-3):
    ok = "OK" if err < tol else "FAIL"
    ROWS.append((name, str(tuple(shape)), err, ok))
    print(f"{name:<28} {str(tuple(shape)):<22} max_abs_err={err:.2e}  {ok}",
          flush=True)


def _save_safetensors(sd, path):
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in sd.items()}, str(path))


def run_unet(tmp):
    import torch

    import jax.numpy as jnp

    from gaussianip_tpu.diffusion import weights
    from gaussianip_tpu.diffusion.torch_mirror import UNet2DConditionModelPT
    from gaussianip_tpu.diffusion.unet import (UNet2DConditionModel,
                                               UNetConfig)

    torch.manual_seed(0)
    t0 = time.time()
    pt = UNet2DConditionModelPT(lora_rank=128, ip_tokens=4).eval()
    sd, ipa = pt.export_state_dict()
    p = os.path.join(tmp, "unet.safetensors")
    _save_safetensors(sd, p)
    print(f"[unet] mirror built+saved in {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    lat = rng.normal(0, 1, (1, 64, 64, 4)).astype(np.float32)
    ts = np.array([901], np.int64)
    ctx = rng.normal(0, 1, (1, 81, 768)).astype(np.float32)  # 77 text + 4 ip

    t0 = time.time()
    with torch.no_grad():
        ref = pt(torch.from_numpy(lat).permute(0, 3, 1, 2),
                 torch.from_numpy(ts),
                 torch.from_numpy(ctx)).permute(0, 2, 3, 1).numpy()
    print(f"[unet] torch fwd {time.time()-t0:.0f}s", flush=True)

    ipa_np = {k: np.asarray(v.detach().float().numpy()) for k, v in
              ipa.items()}
    params = weights.convert_unet(weights.load_torch_state_dict(p),
                                  ipa_state=ipa_np)
    cfg = UNetConfig(lora_rank=128, ip_tokens=4)
    t0 = time.time()
    out, _ = UNet2DConditionModel(cfg).apply(
        params, jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx))
    print(f"[unet] flax fwd (incl compile) {time.time()-t0:.0f}s", flush=True)
    row("unet+lora128+ip4 @64^2", out.shape,
        float(np.max(np.abs(np.asarray(out) - ref))))


def run_vae(tmp):
    import torch

    import jax.numpy as jnp

    from gaussianip_tpu.diffusion import weights
    from gaussianip_tpu.diffusion.torch_mirror import AutoencoderKLPT
    from gaussianip_tpu.diffusion.vae import AutoencoderKL, VAEConfig

    torch.manual_seed(1)
    pt = AutoencoderKLPT().eval()
    p = os.path.join(tmp, "vae.safetensors")
    _save_safetensors(pt.state_dict(), p)

    rng = np.random.default_rng(1)
    img = rng.normal(0, 0.5, (1, 256, 256, 3)).astype(np.float32)
    lat = rng.normal(0, 1, (1, 32, 32, 4)).astype(np.float32)
    with torch.no_grad():
        m_ref = pt.encode_moments(
            torch.from_numpy(img).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()
        d_ref = pt.decode(
            torch.from_numpy(lat).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()

    params = weights.convert_vae(weights.load_torch_state_dict(p))
    cfg = VAEConfig()
    vae = AutoencoderKL(cfg)
    mean, logvar = vae.apply(params, jnp.asarray(img),
                             method=AutoencoderKL.encode_moments)
    m = np.concatenate([np.asarray(mean), np.asarray(logvar)], -1)
    row("vae encode @256^2", m.shape, float(np.max(np.abs(m - m_ref))))
    d = vae.apply(params, jnp.asarray(lat) * cfg.scaling_factor,
                  method=AutoencoderKL.decode)
    row("vae decode ->256^2", d.shape,
        float(np.max(np.abs(np.asarray(d) - d_ref))))


def run_controlnet(tmp):
    import torch

    import jax.numpy as jnp

    from gaussianip_tpu.diffusion import weights
    from gaussianip_tpu.diffusion.torch_mirror import ControlNetModelPT
    from gaussianip_tpu.diffusion.unet import ControlNetModel, UNetConfig

    torch.manual_seed(2)
    pt = ControlNetModelPT().eval()
    p = os.path.join(tmp, "controlnet.safetensors")
    _save_safetensors(pt.state_dict(), p)

    rng = np.random.default_rng(2)
    lat = rng.normal(0, 1, (1, 64, 64, 4)).astype(np.float32)
    ts = np.array([17], np.int64)
    ctx = rng.normal(0, 1, (1, 77, 768)).astype(np.float32)
    cond = rng.uniform(0, 1, (1, 512, 512, 3)).astype(np.float32)
    with torch.no_grad():
        res_ref, mid_ref = pt(torch.from_numpy(lat).permute(0, 3, 1, 2),
                              torch.from_numpy(ts),
                              torch.from_numpy(ctx),
                              torch.from_numpy(cond).permute(0, 3, 1, 2))
        res_ref = [r.permute(0, 2, 3, 1).numpy() for r in res_ref]
        mid_ref = mid_ref.permute(0, 2, 3, 1).numpy()

    params = weights.convert_controlnet(weights.load_torch_state_dict(p))
    res, mid = ControlNetModel(UNetConfig()).apply(
        params, jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx),
        jnp.asarray(cond))
    err = max(float(np.max(np.abs(np.asarray(a) - b)))
              for a, b in zip(res, res_ref))
    row("controlnet 12 res @512^2", (len(res),), err)
    row("controlnet mid", mid.shape,
        float(np.max(np.abs(np.asarray(mid) - mid_ref))))


def run_clip(tmp):
    import torch

    torch.manual_seed(3)
    from transformers import (CLIPTextConfig, CLIPTextModel,
                              CLIPVisionConfig, CLIPVisionModel,
                              FlaxCLIPTextModel, FlaxCLIPVisionModel)

    # ViT-H/14 vision tower (CLIP-ViT-H-14-laion2B: 1280 wide, 32 layers,
    # 16 heads, patch 14) — pipeline.load_image_encoder consumes
    # hidden_states[-2]
    vcfg = CLIPVisionConfig(
        hidden_size=1280, intermediate_size=5120, num_hidden_layers=32,
        num_attention_heads=16, image_size=224, patch_size=14,
        projection_dim=1024)
    pt = CLIPVisionModel(vcfg).eval()
    d = os.path.join(tmp, "clip_vision")
    pt.save_pretrained(d)
    fx = FlaxCLIPVisionModel.from_pretrained(d, from_pt=True)
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = pt(torch.from_numpy(x),
                 output_hidden_states=True).hidden_states[-2].numpy()
    got = np.asarray(
        fx(x, output_hidden_states=True).hidden_states[-2])
    row("clip-vit-h penultimate", got.shape,
        float(np.max(np.abs(got - ref))), tol=1e-3)

    # SD1.5 text encoder (768 wide, 12 layers)
    tcfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77)
    ptt = CLIPTextModel(tcfg).eval()
    dt = os.path.join(tmp, "clip_text")
    ptt.save_pretrained(dt)
    fxt = FlaxCLIPTextModel.from_pretrained(dt, from_pt=True)
    ids = rng.integers(0, 49408, size=(2, 77)).astype("int64")
    with torch.no_grad():
        tref = ptt(torch.from_numpy(ids)).last_hidden_state.numpy()
    tgot = np.asarray(fxt(ids).last_hidden_state)
    row("clip text sd1.5", tgot.shape,
        float(np.max(np.abs(tgot - tref))), tol=1e-3)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1:] or ["unet", "vae", "controlnet", "clip"]
    with tempfile.TemporaryDirectory() as tmp:
        for w in which:
            t0 = time.time()
            {"unet": run_unet, "vae": run_vae,
             "controlnet": run_controlnet, "clip": run_clip}[w](tmp)
            print(f"[{w}] total {time.time()-t0:.0f}s", flush=True)
    print("\n| module | output | max_abs_err | verdict |")
    print("|---|---|---|---|")
    for n, s, e, ok in ROWS:
        print(f"| {n} | {s} | {e:.2e} | {ok} |")
    sys.exit(1 if any(ok == "FAIL" for *_, ok in ROWS) else 0)


if __name__ == "__main__":
    main()
