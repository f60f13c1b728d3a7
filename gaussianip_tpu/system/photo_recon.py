"""Vanilla 3DGS photo-reconstruction trainer (COLMAP / Blender scenes).

Behavioral rebuild of the reference's vendored classic trainer (reference:
gaussiansplatting/train.py:31-219): per step render one training view, loss
(1 - lambda) * L1 + lambda * (1 - SSIM) with lambda_dssim = 0.2
(arguments/__init__.py:81), densify every 100 iters in [500, 15000] at grad
threshold 2e-4 with screen-size pruning after the first opacity reset,
opacity reset every 3000 iters, SH degree raised every 1000 iters
(train.py:72-73), exponential xyz LR over 30k steps with spatial scale =
scene radius. Eval: PSNR/SSIM/LPIPS over held-out views
(gaussiansplatting/metrics.py).

TPU-first: views render in jitted batches at a fixed training resolution;
image decoding happens once up front on the host."""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..data.cameras import camera_from_c2w
from ..data.scene_readers import SceneInfo, load_scene
from ..model.adam import AdamHyper, adam_step, init_adam
from ..model.densify import (
    add_stats,
    densify_and_prune,
    init_stats,
    reset_opacity,
)
from ..model.gaussians import create_from_pcd
from ..ops.knn import mean_dist2_3nn
from ..render.render import RenderConfig, render
from ..utils.metrics import l1 as l1_fn
from ..utils.metrics import psnr, ssim
from .stage1 import TrainState, init_train_state


@struct.dataclass
class PhotoReconConfig:
    iterations: int = struct.field(pytree_node=False, default=7000)
    resolution: int = struct.field(pytree_node=False, default=512)
    batch_size: int = struct.field(pytree_node=False, default=1)
    sh_degree: int = struct.field(pytree_node=False, default=3)
    lambda_dssim: float = 0.2
    densify_from_iter: int = struct.field(pytree_node=False, default=500)
    densify_until_iter: int = struct.field(pytree_node=False, default=15_000)
    densification_interval: int = struct.field(pytree_node=False, default=100)
    densify_grad_threshold: float = 2e-4
    opacity_reset_interval: int = struct.field(pytree_node=False, default=3000)
    percent_dense: float = 0.01
    white_background: bool = struct.field(pytree_node=False, default=False)
    capacity: int = struct.field(pytree_node=False, default=1 << 19)


def _load_images(scene: SceneInfo, res: int):
    from PIL import Image

    imgs = []
    for cam in scene.cameras:
        if os.path.exists(cam.image_path):
            im = Image.open(cam.image_path).convert("RGB").resize((res, res))
            imgs.append(np.asarray(im, np.float32) / 255.0)
        else:
            imgs.append(np.zeros((res, res, 3), np.float32))
    return np.stack(imgs)


def init_from_scene(scene: SceneInfo, cfg: PhotoReconConfig, seed: int = 0):
    if scene.points is not None:
        pts = np.asarray(scene.points, np.float32)
        cols = np.asarray(scene.colors, np.float32)
    else:  # random init inside the camera bounding sphere (blender scenes)
        rng = np.random.default_rng(seed)
        n = 100_000
        pts = (rng.random((n, 3), dtype=np.float32) * 2.6 - 1.3)
        cols = rng.random((n, 3), dtype=np.float32)
    d2 = mean_dist2_3nn(jnp.asarray(pts))
    gs = create_from_pcd(pts, cols, max(cfg.capacity, 2 * len(pts)), d2,
                         max_sh_degree=cfg.sh_degree)
    return init_train_state(gs)


def make_recon_step(cfg: PhotoReconConfig, render_cfg: RenderConfig,
                    adam_hyper: AdamHyper, c2ws, fovys, images,
                    active_sh_degree: int):
    bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
    res = cfg.resolution
    n_views = images.shape[0]
    b = cfg.batch_size

    def step_fn(ts: TrainState, key):
        # key threads through the jit (host loop does no eager splits);
        # split order matches the old host loop exactly
        key_next, key = jax.random.split(key)
        k_ids, _ = jax.random.split(key)
        ids = jax.random.choice(k_ids, n_views, (b,), replace=False)
        cams = jax.vmap(lambda m, f: camera_from_c2w(m, f, res, res))(
            c2ws[ids], fovys[ids])
        tgt = images[ids]
        n = ts.gaussians.capacity

        def loss_fn(g, offset):
            out = render(g, cams, bg, render_cfg, mean2d_offset=offset,
                         active_sh_degree=active_sh_degree)
            ll1 = l1_fn(out.rgb, tgt)
            dssim = 1.0 - ssim(out.rgb, tgt)
            loss = (1 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * dssim
            return loss, {"radii": out.radii, "l1": ll1,
                          "psnr": psnr(out.rgb, tgt)}

        offset = jnp.zeros((b, n, 2))
        (loss, aux), (g_state, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True, allow_int=True
        )(ts.gaussians, offset)
        radii = jnp.max(aux["radii"], axis=0)
        vis = jnp.any(aux["radii"] > 0, axis=0)
        stats = add_stats(ts.stats, jnp.sum(g_off, axis=0), radii, vis)
        grads = {f: getattr(g_state, f) for f in (
            "xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")}
        new_g, new_opt = adam_step(ts.gaussians, grads, ts.opt, adam_hyper,
                                   ts.step)
        return (TrainState(new_g, new_opt, stats, ts.step + 1),
                {"loss": loss, "l1": aux["l1"], "psnr": aux["psnr"],
                 "n_active": new_g.n_active}, key_next)

    return jax.jit(step_fn, donate_argnums=(0,))


def train_photo_recon(
    scene: SceneInfo,
    cfg: PhotoReconConfig = PhotoReconConfig(),
    render_cfg: RenderConfig = RenderConfig(),
    seed: int = 0,
    images: Optional[np.ndarray] = None,
    log_every: int = 500,
    log_fn=None,
):
    ts = init_from_scene(scene, cfg, seed)
    if images is None:
        images = _load_images(scene, cfg.resolution)
    images = jnp.asarray(images)
    c2ws = jnp.asarray(np.stack([c.c2w for c in scene.cameras]))
    fovys = jnp.asarray(np.array([c.fovy for c in scene.cameras], np.float32))
    hyper = AdamHyper(spatial_lr_scale=scene.nerf_normalization_radius)

    @jax.jit
    def densify(ts: TrainState, key, min_opacity, world_thresh):
        g, opt, stats, dropped = densify_and_prune(
            ts.gaussians, ts.opt, ts.stats, key,
            max_grad=cfg.densify_grad_threshold, min_opacity=min_opacity,
            extent=scene.nerf_normalization_radius,
            max_world_size=world_thresh, percent_dense=cfg.percent_dense,
        )
        return TrainState(g, opt, stats, ts.step), dropped

    @jax.jit
    def opacity_reset(ts: TrainState):
        g, opt = reset_opacity(ts.gaussians, ts.opt)
        return TrainState(g, opt, ts.stats, ts.step)

    key = jax.random.PRNGKey(seed)
    active_deg = 0
    step_fn = make_recon_step(cfg, render_cfg, hyper, c2ws, fovys, images,
                              active_deg)
    for i in range(cfg.iterations):
        if i and i % 1000 == 0 and active_deg < cfg.sh_degree:
            active_deg += 1  # oneupSHdegree (train.py:72-73)
            step_fn = make_recon_step(cfg, render_cfg, hyper, c2ws, fovys,
                                      images, active_deg)
        ts, metrics, key = step_fn(ts, key)
        if (cfg.densify_from_iter <= i < cfg.densify_until_iter
                and i % cfg.densification_interval == 0 and i > 0):
            key, k = jax.random.split(key)
            # classic 3DGS: world-size prune only after the first opacity
            # reset (0.1 * extent); min opacity 0.005
            world = (0.1 * scene.nerf_normalization_radius
                     if i > cfg.opacity_reset_interval else 1e9)
            ts, _ = densify(ts, k, 0.005, world)
        if i > 0 and i % cfg.opacity_reset_interval == 0:
            ts = opacity_reset(ts)
        if log_fn is not None and i % log_every == 0:
            log_fn(i, jax.device_get(metrics))
    return ts


def evaluate(ts: TrainState, scene: SceneInfo, cfg: PhotoReconConfig,
             render_cfg: RenderConfig = RenderConfig(), images=None,
             lpips_fn=None):
    """PSNR/SSIM(/LPIPS) over the scene's views (reference:
    gaussiansplatting/metrics.py:24-103)."""
    if images is None:
        images = _load_images(scene, cfg.resolution)
    res = cfg.resolution
    bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
    out_psnr, out_ssim, out_lpips = [], [], []
    for i, cam in enumerate(scene.cameras):
        cams = jax.vmap(lambda m, f: camera_from_c2w(m, f, res, res))(
            jnp.asarray(cam.c2w)[None], jnp.asarray([cam.fovy]))
        out = render(ts.gaussians, cams, bg, render_cfg)
        tgt = jnp.asarray(images[i])[None]
        out_psnr.append(float(psnr(out.rgb, tgt)))
        out_ssim.append(float(ssim(out.rgb, tgt)))
        if lpips_fn is not None:
            out_lpips.append(float(jnp.mean(lpips_fn(out.rgb, tgt))))
    res_d = {"psnr": float(np.mean(out_psnr)), "ssim": float(np.mean(out_ssim))}
    if out_lpips:
        res_d["lpips"] = float(np.mean(out_lpips))
    return res_d
