"""Fused 3x3 convolution for TPU (Pallas): the hot op of the diffusion stack.

XLA's native conv lowering measures 15-21 TF/s bf16 on v5e at SD1.5/VAE
shapes (7-10% of the 197 TF/s MXU peak; see NOTES.md round-2 analysis) and
an im2col matmul is worse (activation-bandwidth bound). This kernel keeps
the 3x3 taps in VMEM and issues 9 accumulating MXU matmuls per row-block —
the input slab is DMA'd once per (batch row-block) and reused across all
output-channel blocks, so HBM traffic is ~1 read of x + 1 write of y.

Used by the VAE encoder/decoder, UNet/ControlNet resblocks, and LPIPS VGG
(reference consumes these through torch/cuDNN: threestudio/models/guidance/
ipa_guidance.py:137-233). Forward and the dL/dx half of the backward run in
Pallas (dL/dx of a stride-1 3x3 conv is itself a 3x3 conv with the kernel
rotated 180 deg and in/out channels swapped); the dL/dW half stays on XLA's
filter-grad path (1/3 of backward FLOPs).

Only stride-1 SAME-padded HWIO convs take this path; everything else
(stride 2, tiny channel counts, non-TPU backends) falls back to
lax.conv_general_dilated.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
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
    """Largest divisor of co keeping the 9*ci*co_blk weight block in budget."""
    for k in range(1, co + 1):
        if co % k == 0 and 9 * ci * (co // k) * itemsize <= _W_BYTES:
            return co // k
    return 1


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
    if ci < 64 or co < 64:  # contraction too shallow for the MXU to matter
        return False
    if w % 8 or w < 8 or h < 3 or x.dtype.itemsize > 4:
        return False  # sublane reshape needs 8 | w
    wp = -(-(w + 2) // 8) * 8
    if 3 * wp * ci * x.dtype.itemsize > _SLAB_BYTES:
        return False  # even a single-row slab would blow VMEM
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
