"""Image quality metrics: PSNR / SSIM (+ L1), pure JAX.

Replaces the reference's eval tooling (reference:
gaussiansplatting/metrics.py:24-103 PSNR/SSIM/LPIPS over render dirs,
gaussiansplatting/utils/loss_utils.py l1/ssim used by the vanilla 3DGS
trainer). SSIM follows the standard 11x11 gaussian window, C1=(0.01)^2,
C2=(0.03)^2 formulation the reference uses. LPIPS lives in
gaussianip_tpu/diffusion/lpips.py."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def psnr(img, ref):
    """[..., H, W, C] -> scalar PSNR in dB (images in [0, 1])."""
    mse = jnp.mean((img - ref) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img, ref, window_size: int = 11):
    """Mean SSIM over [B, H, W, C] (or [H, W, C]) images in [0, 1]."""
    if img.ndim == 3:
        img = img[None]
        ref = ref[None]
    w = _gaussian_window(window_size)
    c = img.shape[-1]
    kernel = jnp.zeros((window_size, window_size, c, c))
    for ch in range(c):
        kernel = kernel.at[:, :, ch, ch].set(w)

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    mu1 = filt(img)
    mu2 = filt(ref)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img * img) - mu1_sq
    s2 = filt(ref * ref) - mu2_sq
    s12 = filt(img * ref) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return jnp.mean(m)


def l1(img, ref):
    return jnp.mean(jnp.abs(img - ref))
