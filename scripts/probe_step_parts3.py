"""Third-level bisect: the REAL stage-1 step body with component toggles."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import functools
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianip_tpu.data.cameras import camera_from_c2w
from gaussianip_tpu.data.sampler import CameraSamplerConfig, sample_train_batch
from gaussianip_tpu.guidance.stub import make_stub_guidance
from gaussianip_tpu.human.posemap import openpose_draw
from gaussianip_tpu.human.skeleton import Skeleton
from gaussianip_tpu.human.smplx_jax import make_test_model
from gaussianip_tpu.model.adam import AdamHyper, adam_step
from gaussianip_tpu.model.densify import add_stats
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig, render
from gaussianip_tpu.system.stage1 import (Stage1Config, TrainState,
                                          init_train_state)

rng = np.random.default_rng(0)
dev = jax.devices()[0]
sk = Skeleton(_test_model=make_test_model(rng, n_verts=2000, n_faces=3000))
sk.forward_smplx()
sk.scale(-10)
pts = sk.sample_smplx_points(100_000)
gs = jax.device_put(create_from_pcd(
    pts, np.full((100_000, 3), 0.5, np.float32), 1 << 17,
    mean_dist2_3nn(jnp.asarray(pts))), dev)
ts0_host = jax.device_get(init_train_state(gs))
points3d = jnp.asarray(sk.points3d)
cfg = Stage1Config()
cam_cfg = CameraSamplerConfig(height=512, width=512, batch_size=4)
rcfg = RenderConfig(d_max=16)
h = w = 512
bg = jnp.zeros(3)
guidance = make_stub_guidance(target_rgb=jnp.zeros((64, 64, 3)),
                              noise_scale=0.01)


def make_step(with_pose, with_stats, with_reg):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(ts, key):
        k_cam, k_guid = jax.random.split(key)
        batch = sample_train_batch(cam_cfg, k_cam, ts.step)
        cams = jax.vmap(lambda c, f: camera_from_c2w(c, f, h, w))(
            batch.c2w, batch.fovy)
        if with_pose:
            head_zoom = (batch.center_z == cfg.head_offset) & (
                batch.azimuth_deg > 0)
            pose_images, all_vis, _ = jax.vmap(
                lambda mvp, az, hz: openpose_draw(points3d, mvp, az, hz, h, w)
            )(batch.mvp_mtx, batch.azimuth_deg, head_zoom)
        else:
            pose_images = jnp.zeros((4, h, w, 3))
            all_vis = jnp.ones((4,))
        n = ts.gaussians.capacity
        b = 4

        def loss_fn(g, offset):
            out = render(g, cams, bg, rcfg, mean2d_offset=offset)
            gout = guidance(ts.step, k_guid, out.rgb, pose_images,
                            {"all_vis": all_vis,
                             "elevation": batch.elevation_deg,
                             "azimuth": batch.azimuth_deg,
                             "center": batch.center_z,
                             "camera_distances": batch.camera_distances})
            loss = gout["loss_sds"] * cfg.lambda_sds
            if with_reg:
                norm_depth = out.depth / (jnp.max(out.depth) + 1e-5)
                loss_sparsity = jnp.mean(jnp.sqrt(norm_depth ** 2 + 0.01))
                loss = loss + loss_sparsity * cfg.lambda_sparsity
                nd = jnp.clip(norm_depth, 1e-3, 1 - 1e-3)
                loss_opaque = -jnp.mean(nd * jnp.log(nd)
                                        + (1 - nd) * jnp.log(1 - nd))
                loss = loss + loss_opaque * cfg.lambda_opaque
            return loss, {"radii": out.radii}

        offset = jnp.zeros((b, n, 2))
        (loss, aux), (g_state, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True, allow_int=True
        )(ts.gaussians, offset)
        stats = ts.stats
        if with_stats:
            radii = jnp.max(aux["radii"], axis=0)
            visibility = jnp.any(aux["radii"] > 0, axis=0)
            stats = add_stats(ts.stats, jnp.sum(g_off, axis=0), radii,
                              visibility)
        grads = {f: getattr(g_state, f) for f in
                 ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")}
        new_g, new_opt = adam_step(ts.gaussians, grads, ts.opt, AdamHyper(),
                                   ts.step)
        return TrainState(new_g, new_opt, stats, ts.step + 1), loss

    return step_fn


def bench(name, fn, n=6):
    ts = jax.device_put(ts0_host, dev)
    k = jax.random.PRNGKey(0)
    t0 = time.time()
    ts, out = fn(ts, k)
    float(out)
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(n):
        k, kk = jax.random.split(k)
        ts, out = fn(ts, kk)
    float(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.0f} ms/step", flush=True)


bench("no pose/stats/reg ", make_step(False, False, False))
bench("+reg              ", make_step(False, False, True))
bench("+stats            ", make_step(False, True, True))
bench("+pose (full stub) ", make_step(True, True, True))
