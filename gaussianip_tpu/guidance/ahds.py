"""AHDS timestep scheduling + ANPG guidance gradient (math layer).

Rebuilds the reference's Adaptive Human Distillation Sampling machinery
(reference: threestudio/models/guidance/ipa_guidance.py:200-210, 544-599,
602-660) with the scipy double-minimize replaced by direct vectorized
computation:

  * the dual-gaussian pdf over t in [0, 800) (sigma1 left of the peak T,
    sigma2 right) is fitted so its mass over the ranges (0,350)/(350,450)/
    (450,800) hits the target sums (0.41, 0.21, 0.375) — here by a dense
    grid search over the (T, s1, s2) box instead of L-BFGS-B (the surface is
    tiny: 3 bounded scalars);
  * the per-step annealed timestep t_i solves |sum_{t>=t_i} p(t) - i/N| —
    here a direct quantile inversion on the pdf's suffix cumsum instead of
    2400 Nelder-Mead solves;
  * the step-windowed random timestep draw and the ANPG 3-way CFG
    decomposition grad = w(t) * (gs*(e_text - e_null) + delta_d) with the
    t<170 mask follow ipa_guidance.py:625-638, 361-440 exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# reference constants (ipa_guidance.py:200-207)
AHDS_N = 2400
AHDS_T0 = 799
MAX_T = 800
TGT_PROB_SUMS = (0.41, 0.21, 0.375)
RANGES = ((0, 350), (350, 450), (450, 800))
BOUNDS = ((200, 400), (20, 100), (100, 300))


def dual_gaussian_pdf(T, s1, s2, max_t: int = MAX_T):
    """Piecewise gaussian: exp(-(t-T)^2 / 2 s1^2) for t <= T else s2."""
    t = np.arange(max_t, dtype=np.float64)
    s = np.where(t <= T, s1, s2)
    w = np.exp(-((t - T) ** 2) / (2 * s * s))
    return w / w.sum()


def fit_dual_gaussian(
    tgt_prob_sums=TGT_PROB_SUMS, ranges=RANGES, bounds=BOUNDS, max_t: int = MAX_T,
    grid: int = 48,
):
    """Dense grid search over the bounded (T, s1, s2) box minimizing the
    squared range-mass error (replaces scipy L-BFGS-B; the box is tiny and
    the error surface is smooth). Returns the normalized pdf [max_t]."""
    Ts = np.linspace(bounds[0][0], bounds[0][1], grid)
    s1s = np.linspace(bounds[1][0], bounds[1][1], grid)
    s2s = np.linspace(bounds[2][0], bounds[2][1], grid)
    t = np.arange(max_t, dtype=np.float64)

    # The pdf splits at T: the left piece depends only on (T, s1), the right
    # only on (T, s2) — so range masses factor into two [G, G, T] tables
    # instead of one [G, G, G, T] cube (which is ~700 MB of exp and took
    # ~90 s; this is the same math in milliseconds).
    d2 = (t[None, :] - Ts[:, None]) ** 2  # [G_T, T]
    left_mask = t[None, :] <= Ts[:, None]
    wl = np.exp(-d2[:, None, :] / (2 * s1s[None, :, None] ** 2)) * \
        left_mask[:, None, :]   # [G_T, G_s1, T]
    wr = np.exp(-d2[:, None, :] / (2 * s2s[None, :, None] ** 2)) * \
        ~left_mask[:, None, :]  # [G_T, G_s2, T]
    # range masses + totals for each factor
    lm = np.stack([wl[..., lo:hi].sum(-1) for lo, hi in ranges], -1)
    rm = np.stack([wr[..., lo:hi].sum(-1) for lo, hi in ranges], -1)
    lt = wl.sum(-1)
    rt = wr.sum(-1)
    mass = lm[:, :, None, :] + rm[:, None, :, :]  # [G, G, G, n_ranges]
    total = lt[:, :, None, None] + rt[:, None, :, None]
    err = ((mass / total - np.asarray(tgt_prob_sums)) ** 2).sum(-1)
    i = np.unravel_index(np.argmin(err), err.shape)
    T_best, s1_best, s2_best = Ts[i[0]], s1s[i[1]], s2s[i[2]]
    best = dual_gaussian_pdf(T_best, s1_best, s2_best, max_t)
    return best.astype(np.float64), (T_best, s1_best, s2_best)


def chosen_t_schedule(pdf, n: int = AHDS_N, t0: int = AHDS_T0):
    """t_i = argmin_t |suffix_sum(t) - i/n| for i in [0, n) — the annealed
    AHDS timestep per training step (replaces 2400 Nelder-Mead solves,
    reference: ipa_guidance.py:587-599; the reference seeds each solve at t0
    but the objective's global minimizer is the suffix-quantile)."""
    suffix = np.cumsum(pdf[::-1])[::-1]  # suffix[t] = sum_{u >= t} p(u)
    targets = np.arange(n) / n
    # suffix is decreasing in t: find t with suffix[t] closest to target
    idx = np.searchsorted(-suffix, -targets)  # first t with suffix <= target
    idx = np.clip(idx, 0, len(pdf) - 1)
    prev = np.clip(idx - 1, 0, len(pdf) - 1)
    pick_prev = np.abs(suffix[prev] - targets) <= np.abs(suffix[idx] - targets)
    out = np.where(pick_prev, prev, idx).astype(np.int32)
    return np.maximum(out, 0)


class AHDSSchedule(NamedTuple):
    chosen_t: jnp.ndarray  # [N] int32
    chosen_t_min: jnp.ndarray  # scalar: last nonzero chosen t


def make_ahds_schedule(n: int = AHDS_N, t0: int = AHDS_T0) -> AHDSSchedule:
    pdf, _ = fit_dual_gaussian()
    ts = chosen_t_schedule(pdf, n, t0)
    nz = ts[ts != 0]
    t_min = int(nz[-1]) if len(nz) else 1
    return AHDSSchedule(jnp.asarray(ts), jnp.int32(t_min))


def sample_timesteps(sched: AHDSSchedule, key, step, batch_size: int):
    """The step-windowed timestep draw (reference: ipa_guidance.py:625-638):
      step <  700: U[500, 800)
      step <  900: U[400, cur_t + 50)
      step < 1400: U[150, cur_t + 50)
      else:        U[20,  cur_t + 50)   (or [20, t_min) once cur_t == 0)
    """
    cur_t = sched.chosen_t[jnp.clip(step, 0, sched.chosen_t.shape[0] - 1)]
    lo = jnp.where(
        step < 700, 500, jnp.where(step < 900, 400, jnp.where(step < 1400, 150, 20))
    )
    hi = jnp.where(
        step < 700,
        800,
        jnp.where(cur_t != 0, cur_t + 50, sched.chosen_t_min),
    )
    hi = jnp.maximum(hi, lo + 1)
    u = jax.random.randint(key, (batch_size,), 0, 1 << 30)
    return lo + u % (hi - lo)


def sds_weight(alphas_cumprod, t, strategy: str = "sds"):
    """w(t) per reference ipa_guidance.py:418-425."""
    a = alphas_cumprod[t]
    if strategy == "sds":
        w = 1.0 - a
    elif strategy == "uniform":
        w = jnp.ones_like(a)
    elif strategy == "fantasia3d":
        w = (a ** 0.5) * (1 - a)
    else:
        raise ValueError(strategy)
    return w.reshape((-1, 1, 1, 1))


def anpg_grad(
    noise_pred_neg, noise_pred_text, noise_pred_null, t, alphas_cumprod,
    guidance_scale: float = 7.5, weighting_strategy: str = "sds",
    grad_clip_pixel: bool = True, grad_clip_threshold: float = 1.0,
):
    """ANPG 3-way decomposition (reference: ipa_guidance.py:413-431):
      delta_c = gs * (e_text - e_null)
      delta_d = [t < 170] * e_null + [t >= 170] * (e_null - e_neg)
      grad = w(t) * (delta_c + delta_d), per-pixel norm clipped."""
    bs = t.shape[0]
    delta_c = guidance_scale * (noise_pred_text - noise_pred_null)
    mask = (t < 170).astype(noise_pred_null.dtype).reshape(bs, 1, 1, 1)
    delta_d = mask * noise_pred_null + (1 - mask) * (noise_pred_null - noise_pred_neg)
    w = sds_weight(alphas_cumprod, t, weighting_strategy)
    grad = w * (delta_c + delta_d)
    if grad_clip_pixel:
        gnorm = jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-8
        grad = jnp.clip(gnorm, max=grad_clip_threshold) * grad / gnorm
    return grad


def sds_grad(
    noise_pred_neg, noise_pred_pos, noise, t, alphas_cumprod,
    guidance_scale: float = 7.5, weighting_strategy: str = "sds",
    guidance_rescale: float = 0.0,
):
    """Plain 2-way CFG SDS gradient (reference: ipa_guidance.py:494-510)."""
    noise_pred = noise_pred_neg + guidance_scale * (noise_pred_pos - noise_pred_neg)
    if guidance_rescale > 0.0:
        std_pos = jnp.std(noise_pred_pos, axis=tuple(range(1, noise_pred.ndim)),
                          keepdims=True)
        std_cfg = jnp.std(noise_pred, axis=tuple(range(1, noise_pred.ndim)),
                          keepdims=True)
        rescaled = noise_pred * (std_pos / std_cfg)
        noise_pred = guidance_rescale * rescaled + (1 - guidance_rescale) * noise_pred
    w = sds_weight(alphas_cumprod, t, weighting_strategy)
    return w * (noise_pred - noise)


def sds_loss(latents, grad):
    """loss whose latent-gradient equals `grad` (reference:
    ipa_guidance.py:647-653)."""
    grad = jnp.nan_to_num(grad)
    target = jax.lax.stop_gradient(latents - grad)
    return 0.5 * jnp.sum((latents - target) ** 2) / latents.shape[0]
