"""Textured OBJ/MTL export (reference:
threestudio/models/exporters/mesh_exporter.py:1-175)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.mesh_export import (
    bake_texture,
    export_avatar_mesh,
    pack_face_uvs,
    vertex_colors,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _ball_state(rng, rgb=(0.8, 0.2, 0.1), n=800, cap=1024):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    u = rng.uniform(0, 1, (n, 1)) ** (1 / 3)
    pts = (v * u * 0.3).astype(np.float32)
    cols = np.tile(np.asarray(rgb, np.float32), (n, 1))
    gs = create_from_pcd(pts, cols, cap, np.full(n, 2e-3, np.float32))
    return gs.replace(opacity=jnp.full((cap, 1), 3.0))


def test_pack_face_uvs_disjoint_and_in_range():
    uv, spec = pack_face_uvs(11, texture_size=256)
    assert uv.shape == (11, 3, 2)
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    # each face's centroid lands in its own atlas cell
    cent = uv.mean(1)  # [F,2] obj-space
    k, size, grid_n = spec["k"], spec["size"], spec["grid_n"]
    tx = np.floor(cent[:, 0] * size / k).astype(int)
    ty = np.floor((1.0 - cent[:, 1]) * size / k).astype(int)
    cells = ty * grid_n + tx
    pair = np.arange(11) // 2  # two faces share a cell, halves disjoint
    np.testing.assert_array_equal(cells, pair)


def test_bake_texture_interpolates_corner_colors():
    f = 4
    uv, spec = pack_face_uvs(f, texture_size=128)
    cols = np.zeros((f, 3, 3))
    cols[:, 0] = [1, 0, 0]
    cols[:, 1] = [0, 1, 0]
    cols[:, 2] = [0, 0, 1]
    tex = bake_texture(cols, spec)
    size = spec["size"]
    assert tex.shape == (size, size, 3)
    # sample each face at its uv centroid -> mean of corner colors
    for i in range(f):
        c = uv[i].mean(0)
        x = int(c[0] * size)
        y = int((1.0 - c[1]) * size)
        np.testing.assert_allclose(tex[y, x], [1 / 3] * 3, atol=0.12)
    # barycentric partition of unity inside cells
    assert tex.max() <= 1.0 + 1e-9


def test_vertex_colors_recover_dc_color(rng):
    gs = _ball_state(rng, rgb=(0.8, 0.2, 0.1))
    # interior points of the ball
    pts = rng.normal(size=(64, 3))
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * 0.15
    cols = vertex_colors(gs, pts.astype(np.float64), resolution=48, patch=6)
    assert cols.shape == (64, 3)
    np.testing.assert_allclose(cols.mean(0), [0.8, 0.2, 0.1], atol=0.1)


def test_export_avatar_mesh_writes_obj_mtl_texture(tmp_path, rng):
    gs = _ball_state(rng, rgb=(0.3, 0.6, 0.9))
    out = export_avatar_mesh(gs, str(tmp_path / "avatar"), resolution=48,
                             density_thresh=0.5, texture_size=256)
    obj = open(out["obj"]).read()
    assert "mtllib avatar.mtl" in obj
    assert out["mtl"].endswith(".mtl")
    mtl = open(out["mtl"]).read()
    assert "map_Kd" in mtl
    # v / vt / f counts are consistent
    n_v = obj.count("\nv ") + obj.startswith("v ")
    n_vt = obj.count("\nvt ")
    n_f = obj.count("\nf ")
    assert n_v > 50 and n_vt == 3 * n_f
    # faces reference valid 1-based indices
    last_f = [ln for ln in obj.splitlines() if ln.startswith("f ")][-1]
    idx = [int(tok.split("/")[0]) for tok in last_f.split()[1:]]
    assert max(idx) <= n_v
    # texture exists and is dominated by the dc color
    if out["texture"].endswith(".npy"):
        tex = np.load(out["texture"]).astype(np.float32) / 255.0
    else:
        import cv2

        tex = cv2.imread(out["texture"])[..., ::-1].astype(np.float32) / 255
    lit = tex[tex.sum(-1) > 0.15]
    assert len(lit) > 100
    np.testing.assert_allclose(lit.mean(0), [0.3, 0.6, 0.9], atol=0.15)


def test_export_plain_obj_fmt(tmp_path, rng):
    gs = _ball_state(rng)
    out = export_avatar_mesh(gs, str(tmp_path / "plain"), resolution=48,
                             density_thresh=0.5, fmt="obj")
    assert set(out) == {"obj"}
    assert open(out["obj"]).readline().startswith("v ")
