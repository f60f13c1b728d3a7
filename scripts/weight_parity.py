"""Real-checkpoint weight-parity harness (one command once weights exist).

Two modes:

1) record (on any machine with `diffusers` + the released checkpoints):
     python scripts/weight_parity.py record --out ref.npz \
       --unet <Realistic_Vision_V4.0_noVAE/unet> --vae <sd-vae-ft-mse> \
       --controlnet <control_v11p_sd15_openpose>
   Runs the torch/diffusers models on fixed seeded inputs and saves the
   inputs + outputs. (Requires diffusers, absent in this environment.)

2) compare (here):
     python scripts/weight_parity.py compare --ref ref.npz \
       --unet <unet/diffusion_pytorch_model.safetensors> [--ipa <bin>] \
       --vae <...> --controlnet <...>
   Loads the real checkpoints through weights.convert_* into the Flax
   modules and checks the activations match the recording.

The same conversion conventions are already numerically validated in-env by
tests/test_weight_parity.py against plain-torch mirrors (no diffusers
needed); this script is the checkpoint-scale version (reference model load:
ipa_guidance.py:127-198).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEED = 1234
LAT = (2, 64, 64, 4)  # NHWC latents
IMG = (1, 256, 256, 3)
CTX = (2, 77, 768)
TS = np.array([17, 901], np.int64)


def fixed_inputs():
    rng = np.random.default_rng(SEED)
    return {
        "lat": rng.normal(0, 1, LAT).astype(np.float32),
        "img": rng.normal(0, 0.5, IMG).astype(np.float32),
        "ctx": rng.normal(0, 1, CTX).astype(np.float32),
        "cond": rng.uniform(0, 1, (2, 512, 512, 3)).astype(np.float32),
        "ts": TS,
    }


def record(args):
    import torch
    from diffusers import AutoencoderKL as AKL
    from diffusers import ControlNetModel as CN
    from diffusers import UNet2DConditionModel as UN

    x = fixed_inputs()
    out = dict(x)
    with torch.no_grad():
        if args.unet:
            unet = UN.from_pretrained(args.unet).eval()
            r = unet(torch.from_numpy(x["lat"]).permute(0, 3, 1, 2),
                     torch.from_numpy(x["ts"]),
                     torch.from_numpy(x["ctx"])).sample
            out["unet_out"] = r.permute(0, 2, 3, 1).numpy()
        if args.vae:
            vae = AKL.from_pretrained(args.vae).eval()
            m = vae.encode(torch.from_numpy(x["img"]).permute(0, 3, 1, 2))
            out["vae_mean"] = (
                m.latent_dist.mean.permute(0, 2, 3, 1).numpy())
            d = vae.decode(torch.from_numpy(x["lat"][:1]).permute(0, 3, 1, 2))
            out["vae_dec"] = d.sample.permute(0, 2, 3, 1).numpy()
        if args.controlnet:
            cn = CN.from_pretrained(args.controlnet).eval()
            res, mid = cn(torch.from_numpy(x["lat"]).permute(0, 3, 1, 2),
                          torch.from_numpy(x["ts"]),
                          torch.from_numpy(x["ctx"]),
                          torch.from_numpy(x["cond"]).permute(0, 3, 1, 2),
                          return_dict=False)
            for i, r in enumerate(res):
                out[f"cn_res_{i}"] = r.permute(0, 2, 3, 1).numpy()
            out["cn_mid"] = mid.permute(0, 2, 3, 1).numpy()
    np.savez(args.out, **out)
    print(f"recorded -> {args.out}")


def compare(args):
    import jax.numpy as jnp

    from gaussianip_tpu.diffusion import weights
    from gaussianip_tpu.diffusion.unet import (ControlNetModel,
                                               UNet2DConditionModel,
                                               UNetConfig)
    from gaussianip_tpu.diffusion.vae import AutoencoderKL, VAEConfig

    ref = dict(np.load(args.ref)) if args.ref else fixed_inputs()
    x = {k: ref[k] for k in ("lat", "img", "ctx", "cond", "ts")}
    fails = 0

    def check(name, got, tol=5e-3):
        nonlocal fails
        if name not in ref:
            print(f"{name}: no recording, computed shape {got.shape}")
            return
        err = float(np.max(np.abs(np.asarray(got) - ref[name])))
        ok = err < tol
        fails += 0 if ok else 1
        print(f"{name}: max_abs_err={err:.2e} {'OK' if ok else 'FAIL'}")

    if args.unet:
        sd = weights.load_torch_state_dict(args.unet)
        ipa = None
        if args.ipa:
            ipa_sd = weights.load_torch_state_dict(args.ipa)
            ipa = {k: np.asarray(v) for k, v in ipa_sd["ip_adapter"].items()}
        params = weights.convert_unet(sd, ipa_state=ipa)
        cfg = UNetConfig(lora_rank=128 if ipa else 0, ip_tokens=4 if ipa else 0)
        out, _ = UNet2DConditionModel(cfg).apply(
            params, jnp.asarray(x["lat"]), jnp.asarray(x["ts"]),
            jnp.asarray(x["ctx"]))
        check("unet_out", out)
    if args.vae:
        params = weights.convert_vae(weights.load_torch_state_dict(args.vae))
        cfg = VAEConfig()
        vae = AutoencoderKL(cfg)
        mean, _ = vae.apply(params, jnp.asarray(x["img"]),
                            method=AutoencoderKL.encode_moments)
        check("vae_mean", mean)
        dec = vae.apply(params, jnp.asarray(x["lat"][:1]) * cfg.scaling_factor,
                        method=AutoencoderKL.decode)
        check("vae_dec", dec)
    if args.controlnet:
        params = weights.convert_controlnet(
            weights.load_torch_state_dict(args.controlnet))
        cfg = UNetConfig()
        res, mid = ControlNetModel(cfg).apply(
            params, jnp.asarray(x["lat"]), jnp.asarray(x["ts"]),
            jnp.asarray(x["ctx"]), jnp.asarray(x["cond"]))
        for i, r in enumerate(res):
            check(f"cn_res_{i}", r)
        check("cn_mid", mid)
    sys.exit(1 if fails else 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["record", "compare"])
    ap.add_argument("--out", default="weight_parity_ref.npz")
    ap.add_argument("--ref", default=None)
    ap.add_argument("--unet")
    ap.add_argument("--ipa")
    ap.add_argument("--vae")
    ap.add_argument("--controlnet")
    args = ap.parse_args()
    (record if args.mode == "record" else compare)(args)


if __name__ == "__main__":
    main()
