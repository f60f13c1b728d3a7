"""Fused 3x3 convolution for TPU (Pallas).

The kernel keeps the 3x3 taps in VMEM and issues 9 accumulating MXU matmuls
per row-block; the input slab is DMA'd once per (batch, row-block) and
reused across output-channel blocks, so HBM traffic is ~1 read of x + 1
write of y.

Measured on v5e bf16 (scripts/probe_conv.py, 2026-08): XLA's native conv is
already strong at these shapes — 64-216 TF/s — so this kernel is a
*forward-path* win only: 1.15-1.35x over XLA fwd (86 vs 64 TF/s at
512^2x128, 136 vs 116 at 128^2x512), NEUTRAL for fwd+bwd (XLA's fused
filter-grad beats our split dx-Pallas/dW-XLA backward). It is therefore
wired into the UNet/ControlNet denoise path, which the product never
backprops through (SDS uses the frozen UNet as a scorer — reference:
threestudio/models/guidance/ipa_guidance.py:391-431 computes the gradient
in closed form), and NOT into the VAE/LPIPS training paths.

dL/dx of a stride-1 3x3 conv is itself a 3x3 conv (kernel rotated 180deg,
channels swapped) and runs in Pallas; dL/dW stays on XLA's filter-grad
path — gradients are exact either way, just not faster than XLA.

Only stride-1 SAME-padded HWIO convs with 128-aligned channel counts take
this path; everything else (stride 2, 320-ch UNet layers, tiny channels,
non-TPU backends) falls back to lax.conv_general_dilated.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-buffer VMEM budgets (bytes); the ~16 MB/core arena must also hold
# the live register arrays (row band + tap slice + matmul operands)
_ACC_BYTES = 2 * 2 ** 20
_W_BYTES = 3 * 2 ** 20
_SLAB_BYTES = 4 * 2 ** 20


def _xla_conv(x, kernel, *, stride=1):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _co_block(ci: int, co: int, itemsize: int) -> int:
    """Largest 128-multiple divisor of co keeping the 9*ci*co_blk weight
    block in budget (Mosaic requires lane-dim block extents to be
    128-aligned — even full-extent blocks of a lane-padded array)."""
    best = 0
    m = co // 128
    for k in range(1, m + 1):
        if m % k == 0 and 9 * ci * (128 * k) * itemsize <= _W_BYTES:
            best = 128 * k
    return best


def _row_block(h: int, w: int, wp: int, ci: int, co_blk: int,
               itemsize: int) -> int:
    """Largest divisor of h fitting acc + slab in the VMEM budget."""
    for th in range(h, 0, -1):
        if h % th:
            continue
        if (th * w * co_blk * 4 <= _ACC_BYTES
                and (th + 2) * wp * ci * itemsize <= _SLAB_BYTES):
            return th
    return 1


def _kernel(x_hbm, w_ref, out_ref, slab, sem, *, th, w, ci, co_blk):
    b = pl.program_id(0)
    ht = pl.program_id(1)
    co = pl.program_id(2)

    # one slab DMA per (b, row-block); co blocks reuse it (co is the
    # innermost grid dim and VMEM scratch persists across grid steps)
    @pl.when(co == 0)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(ht * th, th + 2)], slab, sem)
        cp.start()
        cp.wait()

    # row bands are legal ref slices (dim 0 is untiled); the dx in {0,1,2}
    # sublane offsets would be illegal as unaligned VMEM ref slices, so
    # those become register-level lax.slice shifts on the loaded band
    acc = jnp.zeros((th * w, co_blk), jnp.float32)
    for dy in range(3):
        xr = slab[dy : dy + th]
        for dx in range(3):
            xv = jax.lax.slice(
                xr, (0, dx, 0), (th, dx + w, ci)).reshape(th * w, ci)
            acc += jnp.dot(xv, w_ref[dy, dx],
                           preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, w, co_blk).astype(out_ref.dtype)


def _conv3x3_pallas(x, kernel, interpret: bool = False):
    """Stride-1 SAME 3x3 conv, NHWC x HWIO. x: [B,H,W,Ci] -> [B,H,W,Co]."""
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    kernel = kernel.astype(x.dtype)
    itemsize = x.dtype.itemsize
    co_blk = _co_block(ci, co, itemsize)
    # DMA slices must be 8-aligned along the sublane (W) dim: round the
    # padded width up to a multiple of 8 (the tap slices stay within w+2)
    wp = -(-(w + 2) // 8) * 8
    th = _row_block(h, w, wp, ci, co_blk, itemsize)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))

    grid = (b, h // th, co // co_blk)
    return pl.pallas_call(
        functools.partial(_kernel, th=th, w=w, ci=ci, co_blk=co_blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, ci, co_blk), lambda b, ht, co: (0, 0, 0, co)),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, co_blk), lambda b, ht, co: (b, ht, 0, co)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad, kernel)


def _use_pallas(x, kernel, stride) -> bool:
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    if stride != 1 or kernel.shape[:2] != (3, 3):
        return False
    if os.environ.get("GIP_PALLAS_CONV", "1") == "0":
        return False
    if ci % 128 or co % 128:
        # Mosaic lane alignment: both channel dims must be 128-multiples
        # (the 320-ch UNet layers measure fine through XLA anyway)
        return False
    if h * w < 4096:
        # small-spatial layers (32^2 and below) are grid-overhead bound in
        # the Pallas kernel and measure faster through XLA (probe_conv:
        # 0.31 ms XLA vs 0.44 ms pallas at 32^2x640)
        return False
    if w % 8 or w < 8 or h < 3 or x.dtype.itemsize > 4:
        return False  # sublane reshape needs 8 | w
    wp = -(-(w + 2) // 8) * 8
    if 3 * wp * ci * x.dtype.itemsize > _SLAB_BYTES:
        return False  # even a single-row slab would blow VMEM
    if _co_block(ci, co, x.dtype.itemsize) == 0:
        return False
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv3x3_same(x, kernel, interpret):
    return _conv3x3_pallas(x, kernel, interpret)


def _conv3x3_same_fwd(x, kernel, interpret):
    return _conv3x3_pallas(x, kernel, interpret), (x, kernel)


def _conv3x3_same_bwd(interpret, res, g):
    x, kernel = res
    # dL/dx: 3x3 conv of g with the kernel rotated 180deg, channels swapped
    kt = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = _conv3x3_pallas(g.astype(x.dtype), kt, interpret)
    # dL/dW via XLA's filter-grad path (dW = x (*) g with batch+space as the
    # contraction; 1/3 of the backward FLOPs)
    _, vjp = jax.vjp(lambda k: _xla_conv(x, k), kernel)
    (dw,) = vjp(g.astype(x.dtype))
    return dx, dw


_conv3x3_same.defvjp(_conv3x3_same_fwd, _conv3x3_same_bwd)


def conv3x3(x, kernel, bias: Optional[jnp.ndarray] = None, *, stride: int = 1,
            interpret: bool = False):
    """3x3 NHWC/HWIO conv with SAME (pad 1) padding.

    Pallas fast path on TPU for stride 1; lax.conv fallback otherwise.
    Gradients flow to x, kernel, and bias on both paths.
    """
    if interpret or _use_pallas(x, kernel, stride):
        y = _conv3x3_same(x, kernel, interpret)
    else:
        y = _xla_conv(x, kernel, stride=stride)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class Conv3x3(nn.Module):
    """Drop-in replacement for nn.Conv(features, (3, 3), padding=1) whose
    forward uses the Pallas kernel when profitable. The parameter pytree
    ("kernel" [3,3,Ci,Co] HWIO + "bias" [Co]) is identical to nn.Conv, so
    torch->flax weight conversion is unaffected."""
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, ci, self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        return conv3x3(x, kernel.astype(self.dtype),
                       bias.astype(self.dtype), stride=self.stride)
