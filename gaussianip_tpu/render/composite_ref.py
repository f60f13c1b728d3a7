"""Reference alpha compositor: pure JAX, differentiable, runs on any backend.

Semantics replicate the CUDA tile renderer the reference consumes
(diff-gaussian-rasterization, used at reference:
gaussiansplatting/gaussian_renderer/__init__.py:85-93) exactly, but evaluated
densely per pixel (no tile binning, no footprint truncation):

  * alphas capped at 0.99, contributions below 1/255 skipped entirely;
  * front-to-back compositing in depth order;
  * a gaussian whose inclusion would drop transmittance below 1e-4 — and all
    gaussians behind it — are dropped (the CUDA early-stop), expressed here as
    the closed-form mask  w_i = alpha_i * T_i * [T_{i+1} >= 1e-4]  over the
    unstopped cumulative product, which is provably identical;
  * outputs: accumulated rgb, alpha-weighted depth, accumulated alpha
    (background is composited by the caller as rgb + bg * (1 - alpha)).

This is the correctness oracle for the Pallas kernel and the CPU fallback for
multi-device dry runs. O(N * P): use on small scenes / resolutions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk"))
def composite_reference(
    mean2d, conic, color, opacity, depth, valid, height: int, width: int,
    chunk: int = 256,
):
    """Composite depth-sorted gaussians into (rgb, depth, alpha) images.

    Inputs are the Projected fields ([N, ...]); sorting happens inside.
    Returns rgb [H, W, 3], depth [H, W], alpha [H, W].
    """
    n = mean2d.shape[0]
    pad = -n % chunk
    sort_key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_key, stable=True)
    mean2d = jnp.pad(mean2d[order], ((0, pad), (0, 0)))
    conic = jnp.pad(conic[order], ((0, pad), (0, 0)))
    color = jnp.pad(color[order], ((0, pad), (0, 0)))
    opacity = jnp.pad(opacity[order], (0, pad))
    z = jnp.pad(depth[order], (0, pad))
    alive = jnp.pad(valid[order], (0, pad))

    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    pxg, pyg = jnp.meshgrid(px, py, indexing="xy")  # [H, W]
    pxf = pxg.reshape(-1)  # [P]
    pyf = pyg.reshape(-1)

    nchunks = (n + pad) // chunk

    def body(carry, idx):
        T, acc_rgb, acc_z, acc_a = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk, 0)
        m, c_, col, o_, z_, ok = (
            sl(mean2d), sl(conic), sl(color), sl(opacity), sl(z), sl(alive))
        dx = m[:, 0:1] - pxf[None, :]  # [C, P]
        dy = m[:, 1:2] - pyf[None, :]
        power = (
            -0.5 * (c_[:, 0:1] * dx * dx + c_[:, 2:3] * dy * dy)
            - c_[:, 1:2] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, o_[:, None] * jnp.exp(power))
        alpha = jnp.where((alpha < ALPHA_MIN) | ~ok[:, None], 0.0, alpha)
        t_incl = T[None, :] * jnp.cumprod(1.0 - alpha, axis=0)  # [C, P]
        t_excl = jnp.concatenate([T[None, :], t_incl[:-1]], axis=0)
        w = alpha * t_excl * (t_incl >= T_EPS)
        acc_rgb = acc_rgb + jnp.matmul(
            w.T, col, precision=jax.lax.Precision.HIGHEST
        )  # [P, 3]
        acc_z = acc_z + jnp.sum(w * z_[:, None], axis=0)
        acc_a = acc_a + jnp.sum(w, axis=0)
        return (t_incl[-1], acc_rgb, acc_z, acc_a), None

    P = height * width
    init = (
        jnp.ones((P,), jnp.float32),
        jnp.zeros((P, 3), jnp.float32),
        jnp.zeros((P,), jnp.float32),
        jnp.zeros((P,), jnp.float32),
    )
    (_, rgb, zimg, aimg), _ = jax.lax.scan(body, init, jnp.arange(nchunks))
    return (
        rgb.reshape(height, width, 3),
        zimg.reshape(height, width),
        aimg.reshape(height, width),
    )
