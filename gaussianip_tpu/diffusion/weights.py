"""Torch-checkpoint -> Flax parameter conversion for the diffusion stack.

Maps released diffusers-format state dicts (the reference's models:
Realistic_Vision_V4.0_noVAE UNet, sd-vae-ft-mse, control_v11p_sd15_openpose,
ip-adapter-faceid-plusv2_sd15.bin — reference: configs/exp.yaml:90-118) onto
the gaussianip_tpu Flax modules. Tensor conventions:

  torch Linear  [out, in]        -> flax Dense kernel [in, out]
  torch Conv2d  [out, in, kh, kw]-> flax Conv kernel  [kh, kw, in, out]
  norm weight/bias               -> scale/bias

The CLIP text/image encoders load through transformers' Flax classes with
from_pt=True (no custom mapping needed).

The mapping is validated structurally in tests by round-tripping a synthetic
diffusers-style state dict built from a randomly initialized Flax module
(real-checkpoint numerical fidelity requires the gated SMPL-X/SD downloads
that are absent from this environment; the name map below follows the
published diffusers SD1.5 layout).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _t_linear(w):
    return np.asarray(w).T


def _t_conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


def _norm(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _conv(sd, prefix):
    return {"kernel": _t_conv(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _dense(sd, prefix, bias=True):
    out = {"kernel": _t_linear(sd[f"{prefix}.weight"])}
    if bias:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _resnet(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _dense(sd, f"{p}.time_emb_proj")
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _lora_dense(sd, p, bias, lora=None):
    """LoRADense: main + optional lora_down/up (from the IPA processor
    state, keys '<idx>.to_q_lora.down.weight' etc.)."""
    out = {"main": _dense(sd, p, bias=bias)}
    if lora is not None:
        down, up = lora
        out["lora_down"] = {"kernel": _t_linear(down)}
        out["lora_up"] = {"kernel": _t_linear(up)}
    return out


def fold_lora(params, scale: float = 1.0):
    """Fold LoRA adapters into base kernels: W' = W + scale * A @ B.

    LoRADense computes y = x @ W + scale * (x @ A) @ B with a STATIC scale
    (the reference's IPA LoRA processors run at fixed scale throughout both
    stages, ip_adapter_faceid.py:286-329), so folding is mathematically
    exact for the forward AND for gradients w.r.t. the inputs (the weights
    are frozen during guidance). The folded tree matches a lora_rank=0
    module structure and skips 8 low-rank matmuls per attention block —
    at rank 128 on the 320-wide level-0 blocks the adapters cost 1.6x the
    base projection FLOPs, all of which folding removes (r4 measurement:
    scripts/probe_unetglue.py fold variant)."""
    if not isinstance(params, dict):
        return params
    # a LoRADense node has EXACTLY these keys — require the full match so a
    # future namespace that merely contains same-named submodules alongside
    # others is recursed into, not truncated to {"main": ...}
    if set(params.keys()) == {"main", "lora_down", "lora_up"}:
        main = dict(params["main"])
        a = np.asarray(params["lora_down"]["kernel"], np.float32)
        b = np.asarray(params["lora_up"]["kernel"], np.float32)
        k = np.asarray(main["kernel"], np.float32)
        main["kernel"] = (k + scale * (a @ b)).astype(
            np.asarray(main["kernel"]).dtype)
        return {"main": main}
    return {k: fold_lora(v, scale) for k, v in params.items()}


def _attention(sd, p, ip: bool = False, lora_sd: Dict | None = None,
               lora_prefix: str = ""):
    def lora_pair(name):
        if lora_sd is None:
            return None
        dk = f"{lora_prefix}.{name}_lora.down.weight"
        if dk not in lora_sd:
            return None
        return (lora_sd[dk], lora_sd[f"{lora_prefix}.{name}_lora.up.weight"])

    out = {
        "to_q": _lora_dense(sd, f"{p}.to_q", False, lora_pair("to_q")),
        "to_k": _lora_dense(sd, f"{p}.to_k", False, lora_pair("to_k")),
        "to_v": _lora_dense(sd, f"{p}.to_v", False, lora_pair("to_v")),
        "to_out": _lora_dense(sd, f"{p}.to_out.0", True, lora_pair("to_out")),
    }
    if ip and lora_sd is not None:
        out["to_k_ip"] = {"kernel": _t_linear(lora_sd[f"{lora_prefix}.to_k_ip.weight"])}
        out["to_v_ip"] = {"kernel": _t_linear(lora_sd[f"{lora_prefix}.to_v_ip.weight"])}
    return out


def _transformer2d(sd, p, lora_sd=None, lora_idx_attn1="", lora_idx_attn2=""):
    tb = f"{p}.transformer_blocks.0"
    block = {
        "norm1": _norm(sd, f"{tb}.norm1"),
        "attn1": _attention(sd, f"{tb}.attn1", ip=False, lora_sd=lora_sd,
                            lora_prefix=lora_idx_attn1),
        "norm2": _norm(sd, f"{tb}.norm2"),
        "attn2": _attention(sd, f"{tb}.attn2", ip=True, lora_sd=lora_sd,
                            lora_prefix=lora_idx_attn2),
        "norm3": _norm(sd, f"{tb}.norm3"),
        "ff": {
            "geglu_proj": _dense(sd, f"{tb}.ff.net.0.proj"),
            "out_proj": _dense(sd, f"{tb}.ff.net.2"),
        },
    }
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": _conv(sd, f"{p}.proj_in"),
        "block_0": block,
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_unet(sd: Dict, block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block: int = 2, ipa_state: Dict | None = None):
    """diffusers UNet2DConditionModel state dict -> flax params dict.

    ipa_state: the 'ip_adapter' dict of ip-adapter-faceid-plusv2_sd15.bin —
    numbered by the UNet's attn_processors iteration order (attn1, attn2 per
    transformer block, downs -> mid -> ups), reference:
    ip_adapter_faceid.py:286-344."""
    n = len(block_out_channels)
    params = {
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2"),
        },
        "conv_in": _conv(sd, "conv_in"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }

    # attn_processors iteration order used by the IPA checkpoint numbering:
    # down blocks (attn1, attn2 per attention), then up blocks, then mid
    # (diffusers .attn_processors order: down, up, mid — each attentions.j)
    lora_counter = [0]

    def next_lora_prefixes():
        i1 = str(2 * lora_counter[0])
        i2 = str(2 * lora_counter[0] + 1)
        lora_counter[0] += 1
        return i1, i2

    down_prefixes = []
    for bi in range(n):
        for li in range(layers_per_block):
            params[f"down_{bi}_res_{li}"] = _resnet(
                sd, f"down_blocks.{bi}.resnets.{li}")
            if bi < n - 1:
                down_prefixes.append((f"down_{bi}_attn_{li}",
                                      f"down_blocks.{bi}.attentions.{li}"))
        if bi < n - 1:
            params[f"down_{bi}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv")}

    up_prefixes = []
    for bi in range(n):
        for li in range(layers_per_block + 1):
            params[f"up_{bi}_res_{li}"] = _resnet(
                sd, f"up_blocks.{bi}.resnets.{li}")
            if bi > 0:
                up_prefixes.append((f"up_{bi}_attn_{li}",
                                    f"up_blocks.{bi}.attentions.{li}"))
        if bi < n - 1:
            params[f"up_{bi}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{bi}.upsamplers.0.conv")}

    params["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    params["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")

    for name, dp in down_prefixes:
        i1, i2 = next_lora_prefixes()
        params[name] = _transformer2d(sd, dp, ipa_state, i1, i2)
    for name, up in up_prefixes:
        i1, i2 = next_lora_prefixes()
        params[name] = _transformer2d(sd, up, ipa_state, i1, i2)
    i1, i2 = next_lora_prefixes()
    params["mid_attn"] = _transformer2d(sd, "mid_block.attentions.0",
                                        ipa_state, i1, i2)
    return {"params": params}


def convert_vae(sd: Dict, block_out_channels=(128, 256, 512, 512),
                layers_per_block: int = 2):
    n = len(block_out_channels)

    def vae_attn(p):
        return {
            "group_norm": _norm(sd, f"{p}.group_norm"),
            "to_q": _dense(sd, f"{p}.to_q"),
            "to_k": _dense(sd, f"{p}.to_k"),
            "to_v": _dense(sd, f"{p}.to_v"),
            "to_out": _dense(sd, f"{p}.to_out.0"),
        }

    enc = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_res_0": _resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": vae_attn("encoder.mid_block.attentions.0"),
        "mid_res_1": _resnet(sd, "encoder.mid_block.resnets.1"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    for bi in range(n):
        for li in range(layers_per_block):
            enc[f"down_{bi}_res_{li}"] = _resnet(
                sd, f"encoder.down_blocks.{bi}.resnets.{li}")
        if bi < n - 1:
            enc[f"down_{bi}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{bi}.downsamplers.0.conv")

    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_res_0": _resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": vae_attn("decoder.mid_block.attentions.0"),
        "mid_res_1": _resnet(sd, "decoder.mid_block.resnets.1"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for bi in range(n):
        for li in range(layers_per_block + 1):
            dec[f"up_{bi}_res_{li}"] = _resnet(
                sd, f"decoder.up_blocks.{bi}.resnets.{li}")
        if bi < n - 1:
            dec[f"up_{bi}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv")

    return {"params": {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }}


def convert_controlnet(sd: Dict, block_out_channels=(320, 640, 1280, 1280),
                       layers_per_block: int = 2,
                       conditioning_embed_channels=(16, 32, 96, 256)):
    n = len(block_out_channels)
    n_cond_blocks = 2 * (len(conditioning_embed_channels) - 1)
    n_zero_convs = 1 + n * layers_per_block + (n - 1)
    params = {
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2"),
        },
        "conv_in": _conv(sd, "conv_in"),
        "cond_conv_in": _conv(sd, "controlnet_cond_embedding.conv_in"),
        "cond_conv_out": _conv(sd, "controlnet_cond_embedding.conv_out"),
        "mid_res_0": _resnet(sd, "mid_block.resnets.0"),
        "mid_attn": _transformer2d(sd, "mid_block.attentions.0"),
        "mid_res_1": _resnet(sd, "mid_block.resnets.1"),
        "zero_conv_mid": _conv(sd, "controlnet_mid_block"),
    }
    for i in range(n_cond_blocks):
        params[f"cond_conv_{i}"] = _conv(
            sd, f"controlnet_cond_embedding.blocks.{i}")
    zi = 0
    for bi in range(n):
        for li in range(layers_per_block):
            params[f"down_{bi}_res_{li}"] = _resnet(
                sd, f"down_blocks.{bi}.resnets.{li}")
            if bi < n - 1:
                params[f"down_{bi}_attn_{li}"] = _transformer2d(
                    sd, f"down_blocks.{bi}.attentions.{li}")
        if bi < n - 1:
            params[f"down_{bi}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv")}
    for i in range(n_zero_convs):
        params[f"zero_conv_{i}"] = _conv(sd, f"controlnet_down_blocks.{i}")
    return {"params": params}


def convert_proj_plus(image_proj_sd: Dict):
    """'image_proj' dict of ip-adapter-faceid-plusv2_sd15.bin -> ProjPlusModel
    params (reference module layout: ip_adapter_faceid.py:85-117)."""
    p = {
        "proj_fc1": _dense(image_proj_sd, "proj.0"),
        "proj_fc2": _dense(image_proj_sd, "proj.2"),
        "norm": _norm(image_proj_sd, "norm"),
    }
    pr = {
        "proj_in": _dense(image_proj_sd, "perceiver_resampler.proj_in"),
        "proj_out": _dense(image_proj_sd, "perceiver_resampler.proj_out"),
        "norm_out": _norm(image_proj_sd, "perceiver_resampler.norm_out"),
    }
    for i in range(4):
        base = f"perceiver_resampler.layers.{i}"
        pr[f"attn_{i}"] = {
            "norm1": _norm(image_proj_sd, f"{base}.0.norm1"),
            "norm2": _norm(image_proj_sd, f"{base}.0.norm2"),
            "to_q": _dense(image_proj_sd, f"{base}.0.to_q", bias=False),
            "to_kv": _dense(image_proj_sd, f"{base}.0.to_kv", bias=False),
            "to_out": _dense(image_proj_sd, f"{base}.0.to_out", bias=False),
        }
        pr[f"ff_{i}"] = {
            "norm": _norm(image_proj_sd, f"{base}.1.0"),
            "fc1": _dense(image_proj_sd, f"{base}.1.1", bias=False),
            "fc2": _dense(image_proj_sd, f"{base}.1.3", bias=False),
        }
    p["perceiver_resampler"] = pr
    return {"params": p}


def load_torch_state_dict(path: str) -> Dict:
    """Load a .bin/.pth/.safetensors checkpoint into numpy arrays (CPU)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else v
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Inverse direction: flax params -> diffusers-style state dicts. Used to
# export trained adapters and to round-trip-test the converters without the
# gated checkpoints.
# ---------------------------------------------------------------------------


def _inv_linear(k):
    return np.asarray(k).T


def _inv_conv(k):
    return np.asarray(k).transpose(3, 2, 0, 1)


def _emit_norm(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _emit_conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = _inv_conv(p["kernel"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _emit_dense(sd, prefix, p):
    sd[f"{prefix}.weight"] = _inv_linear(p["kernel"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _emit_resnet(sd, prefix, p):
    _emit_norm(sd, f"{prefix}.norm1", p["norm1"])
    _emit_conv(sd, f"{prefix}.conv1", p["conv1"])
    _emit_norm(sd, f"{prefix}.norm2", p["norm2"])
    _emit_conv(sd, f"{prefix}.conv2", p["conv2"])
    if "time_emb_proj" in p:
        _emit_dense(sd, f"{prefix}.time_emb_proj", p["time_emb_proj"])
    if "conv_shortcut" in p:
        _emit_conv(sd, f"{prefix}.conv_shortcut", p["conv_shortcut"])


def _emit_attention(sd, prefix, p, lora_sd=None, lora_prefix=""):
    for name, tail in (("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"),
                       ("to_out", "to_out.0")):
        _emit_dense(sd, f"{prefix}.{tail}", p[name]["main"])
        if lora_sd is not None and "lora_down" in p[name]:
            lora_sd[f"{lora_prefix}.{name}_lora.down.weight"] = _inv_linear(
                p[name]["lora_down"]["kernel"])
            lora_sd[f"{lora_prefix}.{name}_lora.up.weight"] = _inv_linear(
                p[name]["lora_up"]["kernel"])
    if lora_sd is not None and "to_k_ip" in p:
        lora_sd[f"{lora_prefix}.to_k_ip.weight"] = _inv_linear(
            p["to_k_ip"]["kernel"])
        lora_sd[f"{lora_prefix}.to_v_ip.weight"] = _inv_linear(
            p["to_v_ip"]["kernel"])


def _emit_transformer2d(sd, prefix, p, lora_sd=None, i1="", i2=""):
    _emit_norm(sd, f"{prefix}.norm", p["norm"])
    _emit_conv(sd, f"{prefix}.proj_in", p["proj_in"])
    _emit_conv(sd, f"{prefix}.proj_out", p["proj_out"])
    tb = f"{prefix}.transformer_blocks.0"
    b = p["block_0"]
    _emit_norm(sd, f"{tb}.norm1", b["norm1"])
    _emit_attention(sd, f"{tb}.attn1", b["attn1"], lora_sd, i1)
    _emit_norm(sd, f"{tb}.norm2", b["norm2"])
    _emit_attention(sd, f"{tb}.attn2", b["attn2"], lora_sd, i2)
    _emit_norm(sd, f"{tb}.norm3", b["norm3"])
    _emit_dense(sd, f"{tb}.ff.net.0.proj", b["ff"]["geglu_proj"])
    _emit_dense(sd, f"{tb}.ff.net.2", b["ff"]["out_proj"])


def export_unet(params, block_out_channels=(320, 640, 1280, 1280),
                layers_per_block: int = 2):
    """flax UNet params -> (diffusers state dict, ipa 'ip_adapter' dict)."""
    p = params["params"]
    n = len(block_out_channels)
    sd, lora = {}, {}
    _emit_dense(sd, "time_embedding.linear_1", p["time_embedding"]["linear_1"])
    _emit_dense(sd, "time_embedding.linear_2", p["time_embedding"]["linear_2"])
    _emit_conv(sd, "conv_in", p["conv_in"])
    _emit_norm(sd, "conv_norm_out", p["conv_norm_out"])
    _emit_conv(sd, "conv_out", p["conv_out"])

    counter = [0]

    def nxt():
        i1, i2 = str(2 * counter[0]), str(2 * counter[0] + 1)
        counter[0] += 1
        return i1, i2

    attn_queue = []
    for bi in range(n):
        for li in range(layers_per_block):
            _emit_resnet(sd, f"down_blocks.{bi}.resnets.{li}",
                         p[f"down_{bi}_res_{li}"])
            if bi < n - 1:
                attn_queue.append((f"down_{bi}_attn_{li}",
                                   f"down_blocks.{bi}.attentions.{li}"))
        if bi < n - 1:
            _emit_conv(sd, f"down_blocks.{bi}.downsamplers.0.conv",
                       p[f"down_{bi}_downsample"]["conv"])
    for bi in range(n):
        for li in range(layers_per_block + 1):
            _emit_resnet(sd, f"up_blocks.{bi}.resnets.{li}",
                         p[f"up_{bi}_res_{li}"])
            if bi > 0:
                attn_queue.append((f"up_{bi}_attn_{li}",
                                   f"up_blocks.{bi}.attentions.{li}"))
        if bi < n - 1:
            _emit_conv(sd, f"up_blocks.{bi}.upsamplers.0.conv",
                       p[f"up_{bi}_upsample"]["conv"])
    _emit_resnet(sd, "mid_block.resnets.0", p["mid_res_0"])
    _emit_resnet(sd, "mid_block.resnets.1", p["mid_res_1"])
    for name, dp in attn_queue:
        i1, i2 = nxt()
        _emit_transformer2d(sd, dp, p[name], lora, i1, i2)
    i1, i2 = nxt()
    _emit_transformer2d(sd, "mid_block.attentions.0", p["mid_attn"], lora, i1, i2)
    return sd, lora


def export_vae(params, block_out_channels=(128, 256, 512, 512),
               layers_per_block: int = 2):
    p = params["params"]
    n = len(block_out_channels)
    sd = {}

    def vae_attn(prefix, q):
        _emit_norm(sd, f"{prefix}.group_norm", q["group_norm"])
        for name, tail in (("to_q", "to_q"), ("to_k", "to_k"),
                           ("to_v", "to_v"), ("to_out", "to_out.0")):
            _emit_dense(sd, f"{prefix}.{tail}", q[name])

    enc = p["encoder"]
    _emit_conv(sd, "encoder.conv_in", enc["conv_in"])
    _emit_resnet(sd, "encoder.mid_block.resnets.0", enc["mid_res_0"])
    vae_attn("encoder.mid_block.attentions.0", enc["mid_attn"])
    _emit_resnet(sd, "encoder.mid_block.resnets.1", enc["mid_res_1"])
    _emit_norm(sd, "encoder.conv_norm_out", enc["conv_norm_out"])
    _emit_conv(sd, "encoder.conv_out", enc["conv_out"])
    for bi in range(n):
        for li in range(layers_per_block):
            _emit_resnet(sd, f"encoder.down_blocks.{bi}.resnets.{li}",
                         enc[f"down_{bi}_res_{li}"])
        if bi < n - 1:
            _emit_conv(sd, f"encoder.down_blocks.{bi}.downsamplers.0.conv",
                       enc[f"down_{bi}_downsample"])
    dec = p["decoder"]
    _emit_conv(sd, "decoder.conv_in", dec["conv_in"])
    _emit_resnet(sd, "decoder.mid_block.resnets.0", dec["mid_res_0"])
    vae_attn("decoder.mid_block.attentions.0", dec["mid_attn"])
    _emit_resnet(sd, "decoder.mid_block.resnets.1", dec["mid_res_1"])
    _emit_norm(sd, "decoder.conv_norm_out", dec["conv_norm_out"])
    _emit_conv(sd, "decoder.conv_out", dec["conv_out"])
    for bi in range(n):
        for li in range(layers_per_block + 1):
            _emit_resnet(sd, f"decoder.up_blocks.{bi}.resnets.{li}",
                         dec[f"up_{bi}_res_{li}"])
        if bi < n - 1:
            _emit_conv(sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv",
                       dec[f"up_{bi}_upsample"])
    _emit_conv(sd, "quant_conv", p["quant_conv"])
    _emit_conv(sd, "post_quant_conv", p["post_quant_conv"])
    return sd
