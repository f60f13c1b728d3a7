"""Second-level bisect of the stub stage-1 step: trivial donated dispatch,
render-only, +posemap, +adam on the same TrainState / dispatch pattern."""
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
from gaussianip_tpu.human.posemap import openpose_draw
from gaussianip_tpu.human.skeleton import Skeleton
from gaussianip_tpu.human.smplx_jax import make_test_model
from gaussianip_tpu.model.adam import AdamHyper, adam_step
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig, render
from gaussianip_tpu.system.stage1 import init_train_state, TrainState

rng = np.random.default_rng(0)
dev = jax.devices()[0]
sk = Skeleton(_test_model=make_test_model(rng, n_verts=2000, n_faces=3000))
sk.forward_smplx()
sk.scale(-10)
pts = sk.sample_smplx_points(100_000)
gs = jax.device_put(create_from_pcd(
    pts, np.full((100_000, 3), 0.5, np.float32), 1 << 17,
    mean_dist2_3nn(jnp.asarray(pts))), dev)
ts0 = init_train_state(gs)
ts0_host = jax.device_get(ts0)  # donation deletes device buffers
points3d = jnp.asarray(sk.points3d)
cam_cfg = CameraSamplerConfig(height=512, width=512, batch_size=4)
rcfg = RenderConfig(d_max=16)
h = w = 512
bg = jnp.zeros(3)


def bench(name, fn, n=8):
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


@functools.partial(jax.jit, donate_argnums=(0,))
def trivial(ts, key):
    g = ts.gaussians
    return TrainState(g.replace(xyz=g.xyz + 1e-12), ts.opt, ts.stats,
                      ts.step + 1), jnp.sum(g.xyz[0])


bench("trivial donated", trivial)


@functools.partial(jax.jit, donate_argnums=(0,))
def render_fb(ts, key):
    batch = sample_train_batch(cam_cfg, key, ts.step)
    cams = jax.vmap(lambda c, f: camera_from_c2w(c, f, h, w))(
        batch.c2w, batch.fovy)
    n = ts.gaussians.capacity

    def loss(g, off):
        out = render(g, cams, bg, rcfg, mean2d_offset=off)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)

    off = jnp.zeros((4, n, 2))
    l, grads = jax.value_and_grad(loss, argnums=(0, 1), allow_int=True)(
        ts.gaussians, off)
    g = ts.gaussians
    return TrainState(g.replace(xyz=g.xyz + 1e-12 * jnp.sum(grads[0].xyz)),
                      ts.opt, ts.stats, ts.step + 1), l


bench("render fwd+bwd", render_fb)


@functools.partial(jax.jit, donate_argnums=(0,))
def render_pose_adam(ts, key):
    batch = sample_train_batch(cam_cfg, key, ts.step)
    cams = jax.vmap(lambda c, f: camera_from_c2w(c, f, h, w))(
        batch.c2w, batch.fovy)
    head_zoom = (batch.center_z == 0.65) & (batch.azimuth_deg > 0)
    pose_images, all_vis, _ = jax.vmap(
        lambda mvp, az, hz: openpose_draw(points3d, mvp, az, hz, h, w)
    )(batch.mvp_mtx, batch.azimuth_deg, head_zoom)
    n = ts.gaussians.capacity

    def loss(g, off):
        out = render(g, cams, bg, rcfg, mean2d_offset=off)
        return (jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)
                + jnp.sum(pose_images) * 0.0)

    off = jnp.zeros((4, n, 2))
    (l, ), grads = jax.value_and_grad(loss, argnums=(0, 1), allow_int=True)(
        ts.gaussians, off), None
    lval, gr = l
    grads_d = {f: getattr(gr[0], f) for f in
               ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")}
    new_g, new_opt = adam_step(ts.gaussians, grads_d, ts.opt, AdamHyper(),
                               ts.step)
    return TrainState(new_g, new_opt, ts.stats, ts.step + 1), lval


bench("render+pose+adam", render_pose_adam)
