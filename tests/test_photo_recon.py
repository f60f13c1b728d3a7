"""Vanilla 3DGS photo-reconstruction: synthetic scene end-to-end + metrics +
Blender/COLMAP readers."""

import json
import os
import struct as pystruct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianip_tpu.data.cameras import camera_from_c2w
from gaussianip_tpu.data.scene_readers import (
    SceneCamera,
    SceneInfo,
    load_blender_scene,
    load_colmap_scene,
)
from gaussianip_tpu.model.densify import reset_opacity
from gaussianip_tpu.model.adam import init_adam
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.camera_math import look_at_c2w
from gaussianip_tpu.render.render import RenderConfig, render
from gaussianip_tpu.system.photo_recon import (
    PhotoReconConfig,
    evaluate,
    train_photo_recon,
)
from gaussianip_tpu.utils.metrics import psnr, ssim


def test_psnr_ssim_sanity(rng):
    a = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(psnr(a, a)) > 100
    assert abs(float(ssim(a, a)) - 1.0) < 1e-5
    b = jnp.clip(a + 0.1, 0, 1)
    assert float(psnr(a, b)) < 25
    assert float(ssim(a, b)) < 1.0


def test_reset_opacity(rng):
    st = create_from_pcd(rng.normal(size=(10, 3)).astype(np.float32),
                         np.full((10, 3), 0.5, np.float32), 16,
                         rng.uniform(0.001, 0.01, 10))
    st = st.replace(opacity=st.opacity.at[:10].set(3.0))  # sigmoid ~ 0.95
    opt = init_adam(st)
    opt = opt.replace(m={**opt.m, "opacity": opt.m["opacity"] + 1.0})
    st2, opt2 = reset_opacity(st, opt)
    op = np.asarray(st2.get_opacity()[:10, 0])
    assert (op <= 0.0101).all()
    assert float(jnp.abs(opt2.m["opacity"]).max()) == 0.0


def _toy_scene(rng, n_views=6, res=64):
    # gaussians form the ground-truth scene; render its views as "photos"
    n = 400
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * 0.5).astype(np.float32)
    cols = (v * 0.5 + 0.5).astype(np.float32)
    gt = create_from_pcd(pts, cols, 512, np.full(n, 2e-3, np.float32))
    gt = gt.replace(opacity=jnp.full((512, 1), 2.0))
    az = np.linspace(0, 2 * np.pi, n_views, endpoint=False)
    eye = np.stack([2.0 * np.cos(az), 2.0 * np.sin(az), np.full(n_views, 0.3)], 1)
    c2w = np.asarray(look_at_c2w(jnp.asarray(eye, jnp.float32),
                                 jnp.zeros((n_views, 3)),
                                 jnp.tile(jnp.array([[0.0, 0, 1]]), (n_views, 1))))
    cams = [SceneCamera(c2w[i], 0.9, 0.9, f"/nonexistent/{i}.png", res, res)
            for i in range(n_views)]
    jcams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(0.9), res, res))(
        jnp.asarray(c2w))
    imgs = np.asarray(render(gt, jcams, jnp.zeros(3),
                             RenderConfig(backend="reference")).rgb)
    scene = SceneInfo(cams, pts + rng.normal(0, 0.02, pts.shape).astype(np.float32),
                      np.full((n, 3), 0.5, np.float32), 2.2)
    return scene, imgs


@pytest.mark.slow
def test_photo_recon_end_to_end(rng):
    scene, imgs = _toy_scene(rng)
    cfg = PhotoReconConfig(iterations=25, resolution=64, sh_degree=0,
                           capacity=1024, densify_from_iter=5,
                           densification_interval=10,
                           opacity_reset_interval=1000)
    rcfg = RenderConfig(backend="reference")
    logs = []
    ts = train_photo_recon(scene, cfg, rcfg, images=imgs, log_every=5,
                           log_fn=lambda i, m: logs.append(m))
    assert len(logs) == 5
    assert logs[-1]["loss"] < logs[0]["loss"]
    res = evaluate(ts, scene, cfg, rcfg, images=imgs)
    assert res["psnr"] > 10 and 0 < res["ssim"] <= 1.0


def test_blender_reader(tmp_path):
    d = {
        "camera_angle_x": 0.7,
        "frames": [
            {"file_path": "./r_0",
             "transform_matrix": np.eye(4).tolist()},
            {"file_path": "./r_1",
             "transform_matrix": (np.eye(4) + 0.01).tolist()},
        ],
    }
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(d, f)
    scene = load_blender_scene(str(tmp_path))
    assert len(scene.cameras) == 2
    assert scene.cameras[0].fovx == 0.7
    # y/z flip applied
    np.testing.assert_allclose(scene.cameras[0].c2w[:3, 1], [0, -1, 0])


def test_colmap_reader(tmp_path):
    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(pystruct.pack("<Q", 1))
        f.write(pystruct.pack("<iiQQ", 1, 1, 64, 48))  # PINHOLE
        f.write(pystruct.pack("<dddd", 50.0, 50.0, 32.0, 24.0))
    with open(sparse / "images.bin", "wb") as f:
        f.write(pystruct.pack("<Q", 1))
        f.write(pystruct.pack("<i", 7))
        f.write(pystruct.pack("<dddd", 1, 0, 0, 0))
        f.write(pystruct.pack("<ddd", 0.1, 0.2, 0.3))
        f.write(pystruct.pack("<i", 1))
        f.write(b"img0.png\x00")
        f.write(pystruct.pack("<Q", 0))
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(pystruct.pack("<Q", 2))
        for i in range(2):
            f.write(pystruct.pack("<Q", i))
            f.write(pystruct.pack("<ddd", i, 0, 0))
            f.write(pystruct.pack("<BBB", 255, 128, 0))
            f.write(pystruct.pack("<d", 0.5))
            f.write(pystruct.pack("<Q", 0))
    scene = load_colmap_scene(str(tmp_path))
    assert len(scene.cameras) == 1
    assert scene.points.shape == (2, 3)
    np.testing.assert_allclose(scene.colors[0], [1.0, 128 / 255, 0])
    cam = scene.cameras[0]
    assert cam.width == 64 and cam.height == 48
    np.testing.assert_allclose(cam.fovy, 2 * np.arctan(48 / 100), rtol=1e-6)
