"""Plain-torch mirror of the diffusers SD1.5 module layout, for numerical
weight-converter parity tests.

This implements the *published* SD1.5 UNet / VAE / ControlNet architecture
(the models the reference loads through the diffusers library — reference:
threestudio/models/guidance/ipa_guidance.py:127-198) with torch.nn modules
named so that ``state_dict()`` emits exactly the diffusers checkpoint key
layout. That lets tests (tests/test_weight_parity.py) do the full loop the
real launch path uses:

    torch mirror -> .safetensors ON DISK -> weights.load_torch_state_dict
    -> weights.convert_unet/vae/controlnet -> Flax forward
    == recorded torch forward (same inputs)

which validates every conversion convention numerically (Linear/Conv
transposes, GroupNorm grouping, attention head reshape order, GEGLU split
order, NHWC, LoRA processor numbering) without the gated multi-GB
checkpoints. When the real checkpoints are present, the same comparison runs
against them via scripts/weight_parity.py.

CPU/eval only — this is a test harness, not a training path.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding_pt(t, dim: int):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    emb = torch.exp(exponent / half)[None, :] * t[:, None].float()
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TimeEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-5)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-5)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class _ToOut(nn.Module):
    """diffusers wraps the output projection in a ModuleList ('to_out.0')."""

    def __init__(self, dim):
        super().__init__()
        self.add_module("0", nn.Linear(dim, dim))

    def forward(self, x):
        return getattr(self, "0")(x)


class LoRAAdapter(nn.Module):
    """diffusers LoRALinearLayer pair as stored in the IPA checkpoint
    ('<idx>.to_q_lora.down.weight' / '.up.weight')."""

    def __init__(self, dim, out_dim, rank):
        super().__init__()
        self.down = nn.Linear(dim, rank, bias=False)
        self.up = nn.Linear(rank, out_dim, bias=False)
        nn.init.normal_(self.down.weight, std=1.0 / rank)
        nn.init.normal_(self.up.weight, std=0.02)  # nonzero to exercise path

    def forward(self, x):
        return self.up(self.down(x))


class Attention(nn.Module):
    """diffusers Attention with optional LoRA + decomposed IP-Adapter path
    (reference: ip_adapter/attention_processor_faceid.py LoRAIPAttnProcessor).
    """

    def __init__(self, dim, heads, ctx_dim=None, lora_rank=0, ip_tokens=0,
                 lora_scale=1.0, ip_scale=1.0):
        super().__init__()
        kv_dim = ctx_dim or dim
        self.heads = heads
        self.ip_tokens = ip_tokens
        self.lora_scale = lora_scale
        self.ip_scale = ip_scale
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(kv_dim, dim, bias=False)
        self.to_v = nn.Linear(kv_dim, dim, bias=False)
        self.to_out = _ToOut(dim)
        self.lora = None
        if lora_rank:
            self.lora = nn.ModuleDict({
                "to_q": LoRAAdapter(dim, dim, lora_rank),
                "to_k": LoRAAdapter(kv_dim, dim, lora_rank),
                "to_v": LoRAAdapter(kv_dim, dim, lora_rank),
                "to_out": LoRAAdapter(dim, dim, lora_rank),
            })
        if ip_tokens:
            self.to_k_ip = nn.Linear(kv_dim, dim, bias=False)
            self.to_v_ip = nn.Linear(kv_dim, dim, bias=False)

    def _heads(self, x):
        b, s, d = x.shape
        return x.view(b, s, self.heads, d // self.heads).transpose(1, 2)

    def _attend(self, q, k, v):
        o = F.scaled_dot_product_attention(
            self._heads(q), self._heads(k), self._heads(v))
        b, h, s, d = o.shape
        return o.transpose(1, 2).reshape(b, s, h * d)

    def _proj(self, name, x):
        y = getattr(self, name)(x)
        if self.lora is not None:
            y = y + self.lora_scale * self.lora[name](x)
        return y

    def forward(self, x, ctx=None):
        q = self._proj("to_q", x)
        src = x if ctx is None else ctx
        if ctx is not None and self.ip_tokens:
            txt, ip = src[:, : -self.ip_tokens], src[:, -self.ip_tokens:]
            out = self._attend(q, self._proj("to_k", txt),
                               self._proj("to_v", txt))
            out = out + self.ip_scale * self._attend(
                q, self.to_k_ip(ip), self.to_v_ip(ip))
        else:
            out = self._attend(q, self._proj("to_k", src),
                               self._proj("to_v", src))
        y = self.to_out(out)
        if self.lora is not None:
            y = y + self.lora_scale * self.lora["to_out"](out)
        return y


class FeedForward(nn.Module):
    """GEGLU net: net.0.proj (Linear d->8d), net.2 (Linear 4d->d)."""

    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList([
            nn.Module(), nn.Identity(), nn.Linear(4 * dim, dim)])
        self.net[0].proj = nn.Linear(dim, 8 * dim)

    def forward(self, x):
        h = self.net[0].proj(x)
        h, gate = h.chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim, lora_rank=0, ip_tokens=0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = Attention(dim, heads, lora_rank=lora_rank)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = Attention(dim, heads, ctx_dim, lora_rank=lora_rank,
                               ip_tokens=ip_tokens)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    def __init__(self, ch, heads, ctx_dim, groups=32, lora_rank=0,
                 ip_tokens=0):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, heads, ctx_dim, lora_rank, ip_tokens)])
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.transformer_blocks[0](y, ctx)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


class _DownBlock(nn.Module):
    def __init__(self, in_ch, ch, temb, n_layers, heads, ctx_dim, groups,
                 attn, down, lora_rank=0, ip_tokens=0):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_ch if i == 0 else ch, ch, temb, groups)
            for i in range(n_layers)])
        if attn:
            self.attentions = nn.ModuleList([
                Transformer2DModel(ch, heads, ctx_dim, groups, lora_rank,
                                   ip_tokens) for _ in range(n_layers)])
        if down:
            ds = nn.Module()
            ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
            self.downsamplers = nn.ModuleList([ds])


class _UpBlock(nn.Module):
    def __init__(self, in_chs, ch, temb, heads, ctx_dim, groups, attn, up,
                 lora_rank=0, ip_tokens=0):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(ic, ch, temb, groups) for ic in in_chs])
        if attn:
            self.attentions = nn.ModuleList([
                Transformer2DModel(ch, heads, ctx_dim, groups, lora_rank,
                                   ip_tokens) for _ in range(len(in_chs))])
        if up:
            us = nn.Module()
            us.conv = nn.Conv2d(ch, ch, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])


class _MidBlock(nn.Module):
    def __init__(self, ch, temb, heads, ctx_dim, groups, lora_rank=0,
                 ip_tokens=0):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(ch, ch, temb, groups),
            ResnetBlock2D(ch, ch, temb, groups)])
        self.attentions = nn.ModuleList([
            Transformer2DModel(ch, heads, ctx_dim, groups, lora_rank,
                               ip_tokens)])


class UNet2DConditionModelPT(nn.Module):
    """Mirror of gaussianip_tpu.diffusion.unet.UNet2DConditionModel with
    the diffusers state-dict layout (SD1.5 topology)."""

    def __init__(self, block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block=2, cross_attention_dim=768, heads=8,
                 groups=32, in_channels=4, out_channels=4, lora_rank=0,
                 ip_tokens=0):
        super().__init__()
        chs = block_out_channels
        n = len(chs)
        L = layers_per_block
        temb = chs[0] * 4
        self.chs, self.L, self.heads = chs, L, heads
        self.conv_in = nn.Conv2d(in_channels, chs[0], 3, padding=1)
        self.time_embedding = TimeEmbedding(chs[0], temb)
        self.down_blocks = nn.ModuleList()
        skip = [chs[0]]
        in_ch = chs[0]
        for bi, ch in enumerate(chs):
            attn = bi < n - 1
            self.down_blocks.append(_DownBlock(
                in_ch, ch, temb, L, heads, cross_attention_dim, groups, attn,
                bi < n - 1, lora_rank, ip_tokens))
            skip += [ch] * L
            if bi < n - 1:
                skip.append(ch)
            in_ch = ch
        self.mid_block = _MidBlock(chs[-1], temb, heads, cross_attention_dim,
                                   groups, lora_rank, ip_tokens)
        self.up_blocks = nn.ModuleList()
        rchs = list(reversed(chs))
        h_ch = chs[-1]
        for bi, ch in enumerate(rchs):
            attn = bi > 0
            in_chs = []
            for li in range(L + 1):
                s = skip.pop()
                in_chs.append(h_ch + s)
                h_ch = ch
            self.up_blocks.append(_UpBlock(
                in_chs, ch, temb, heads, cross_attention_dim, groups, attn,
                bi < n - 1, lora_rank, ip_tokens))
        self.conv_norm_out = nn.GroupNorm(groups, chs[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chs[0], out_channels, 3, padding=1)

    def forward(self, sample, timesteps, ctx, down_residuals=None,
                mid_residual=None):
        temb = self.time_embedding(timestep_embedding_pt(
            timesteps, self.chs[0]))
        h = self.conv_in(sample)
        stack = [h]
        for bi, blk in enumerate(self.down_blocks):
            for li, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[li](h, ctx)
                stack.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                stack.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        if down_residuals is not None:
            stack = [s + r for s, r in zip(stack, down_residuals)]
        if mid_residual is not None:
            h = h + mid_residual
        for bi, blk in enumerate(self.up_blocks):
            for li, res in enumerate(blk.resnets):
                h = torch.cat([h, stack.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[li](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))

    def export_state_dict(self):
        """diffusers UNet keys + separate IPA processor-state dict (LoRA /
        ip projections, numbered in attn_processors order: down, up, mid —
        reference: ip_adapter_faceid.py:286-344)."""
        sd = {}
        ipa = {}
        counter = [0]
        full = self.state_dict()
        for k, v in full.items():
            if ".lora." in k or ".to_k_ip." in k or ".to_v_ip." in k:
                continue
            sd[k] = v
        # IPA processor dict
        def emit_ipa(t2d: Transformer2DModel):
            blk = t2d.transformer_blocks[0]
            i1 = str(2 * counter[0])
            i2 = str(2 * counter[0] + 1)
            counter[0] += 1
            for i, attn in ((i1, blk.attn1), (i2, blk.attn2)):
                if attn.lora is not None:
                    for nm in ("to_q", "to_k", "to_v", "to_out"):
                        ipa[f"{i}.{nm}_lora.down.weight"] = \
                            attn.lora[nm].down.weight
                        ipa[f"{i}.{nm}_lora.up.weight"] = attn.lora[nm].up.weight
                if attn.ip_tokens:
                    ipa[f"{i}.to_k_ip.weight"] = attn.to_k_ip.weight
                    ipa[f"{i}.to_v_ip.weight"] = attn.to_v_ip.weight

        for blk in self.down_blocks:
            if hasattr(blk, "attentions"):
                for a in blk.attentions:
                    emit_ipa(a)
        for blk in self.up_blocks:
            if hasattr(blk, "attentions"):
                for a in blk.attentions:
                    emit_ipa(a)
        emit_ipa(self.mid_block.attentions[0])
        return sd, ipa


class VAEAttentionPT(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = _ToOut(ch)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        o = F.scaled_dot_product_attention(
            self.to_q(y)[:, None], self.to_k(y)[:, None],
            self.to_v(y)[:, None])[:, 0]
        o = self.to_out(o).reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + o


class _VAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(ch, ch, 0, groups), ResnetBlock2D(ch, ch, 0, groups)])
        self.attentions = nn.ModuleList([VAEAttentionPT(ch, groups)])

    def forward(self, h):
        h = self.resnets[0](h)
        h = self.attentions[0](h)
        return self.resnets[1](h)


class AutoencoderKLPT(nn.Module):
    """diffusers AutoencoderKL (sd-vae-ft-mse topology) mirror."""

    def __init__(self, block_out_channels=(128, 256, 512, 512),
                 layers_per_block=2, latent_channels=4, groups=32):
        super().__init__()
        chs = block_out_channels
        n = len(chs)
        L = layers_per_block
        self.L = L

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, chs[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        in_ch = chs[0]
        for bi, ch in enumerate(chs):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                ResnetBlock2D(in_ch if i == 0 else ch, ch, 0, groups)
                for i in range(L)])
            if bi < n - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            enc.down_blocks.append(blk)
            in_ch = ch
        enc.mid_block = _VAEMid(chs[-1], groups)
        enc.conv_norm_out = nn.GroupNorm(groups, chs[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(chs[-1], 2 * latent_channels, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        rchs = list(reversed(chs))
        dec.conv_in = nn.Conv2d(latent_channels, rchs[0], 3, padding=1)
        dec.mid_block = _VAEMid(rchs[0], groups)
        dec.up_blocks = nn.ModuleList()
        in_ch = rchs[0]
        for bi, ch in enumerate(rchs):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                ResnetBlock2D(in_ch if i == 0 else ch, ch, 0, groups)
                for i in range(L + 1)])
            if bi < n - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            dec.up_blocks.append(blk)
            in_ch = ch
        dec.conv_norm_out = nn.GroupNorm(groups, rchs[-1], eps=1e-6)
        dec.conv_out = nn.Conv2d(rchs[-1], 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))
                h = blk.downsamplers[0].conv(h)
        h = self.encoder.mid_block(h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block(h)
        for blk in self.decoder.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


class ControlNetModelPT(nn.Module):
    """diffusers ControlNetModel (control_v11p_sd15_openpose topology)."""

    def __init__(self, block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block=2, cross_attention_dim=768, heads=8,
                 groups=32, cond_channels=3,
                 conditioning_embed_channels=(16, 32, 96, 256)):
        super().__init__()
        chs = block_out_channels
        n = len(chs)
        L = layers_per_block
        temb = chs[0] * 4
        self.chs, self.L = chs, L
        self.conv_in = nn.Conv2d(4, chs[0], 3, padding=1)
        self.time_embedding = TimeEmbedding(chs[0], temb)

        emb = nn.Module()
        echs = conditioning_embed_channels
        emb.conv_in = nn.Conv2d(cond_channels, echs[0], 3, padding=1)
        emb.blocks = nn.ModuleList()
        for i in range(len(echs) - 1):
            emb.blocks.append(nn.Conv2d(echs[i], echs[i], 3, padding=1))
            emb.blocks.append(
                nn.Conv2d(echs[i], echs[i + 1], 3, stride=2, padding=1))
        emb.conv_out = nn.Conv2d(echs[-1], chs[0], 3, padding=1)
        nn.init.normal_(emb.conv_out.weight, std=0.02)  # nonzero for parity
        self.controlnet_cond_embedding = emb

        self.down_blocks = nn.ModuleList()
        in_ch = chs[0]
        for bi, ch in enumerate(chs):
            attn = bi < n - 1
            self.down_blocks.append(_DownBlock(
                in_ch, ch, temb, L, heads, cross_attention_dim, groups, attn,
                bi < n - 1))
            in_ch = ch
        self.mid_block = _MidBlock(chs[-1], temb, heads, cross_attention_dim,
                                   groups)
        zc = []
        for bi, ch in enumerate(chs):
            for _ in range(L):
                zc.append(ch)
            if bi < n - 1:
                zc.append(ch)
        self.controlnet_down_blocks = nn.ModuleList(
            [nn.Conv2d(chs[0], chs[0], 1)] +
            [nn.Conv2d(c, c, 1) for c in zc])
        self.controlnet_mid_block = nn.Conv2d(chs[-1], chs[-1], 1)
        for m in list(self.controlnet_down_blocks) + [self.controlnet_mid_block]:
            nn.init.normal_(m.weight, std=0.02)  # nonzero for parity

    def forward(self, sample, timesteps, ctx, cond, scale=1.0):
        temb = self.time_embedding(timestep_embedding_pt(
            timesteps, self.chs[0]))
        h = self.conv_in(sample)
        e = self.controlnet_cond_embedding
        c = F.silu(e.conv_in(cond))
        for blk in e.blocks:
            c = F.silu(blk(c))
        h = h + e.conv_out(c)
        down = [h]
        for blk in self.down_blocks:
            for li, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[li](h, ctx)
                down.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                down.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        out = [z(d) * scale
               for z, d in zip(self.controlnet_down_blocks, down)]
        mid = self.controlnet_mid_block(h) * scale
        return out, mid
