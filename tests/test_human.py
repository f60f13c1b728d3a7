import math

import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.human.posemap import openpose_draw
from gaussianip_tpu.human.skeleton import (
    OPENPOSE18_COLORS,
    Skeleton,
    apose_body_pose,
)
from gaussianip_tpu.human.smplx_jax import (
    make_test_model,
    rodrigues,
    smplx_forward,
)


def test_rodrigues_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    aa = rng.normal(size=(20, 3)).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(aa)))
    R_ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    # zero angle -> identity
    np.testing.assert_allclose(
        np.asarray(rodrigues(jnp.zeros(3))), np.eye(3), atol=1e-7
    )


def test_smplx_zero_pose_is_template(rng):
    m = make_test_model(rng)
    out = smplx_forward(m)
    np.testing.assert_allclose(
        np.asarray(out.vertices), np.asarray(m.v_template), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.pose_offsets), 0, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(out.joints[:55]),
        np.asarray(m.j_regressor @ m.v_template),
        atol=1e-5,
    )


def test_smplx_global_rotation_is_rigid(rng):
    from scipy.spatial.transform import Rotation

    m = make_test_model(rng)
    aa = np.array([0.3, -0.2, 0.5], np.float32)
    out0 = smplx_forward(m)
    out1 = smplx_forward(m, global_orient=jnp.asarray(aa))
    R = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
    root = np.asarray(m.j_regressor @ m.v_template)[0]
    expected = (np.asarray(out0.vertices) - root) @ R.T + root
    # pose blend shapes from the root are zero (posedirs excludes the root)
    np.testing.assert_allclose(np.asarray(out1.vertices), expected, atol=1e-4)


def test_smplx_betas_move_vertices(rng):
    m = make_test_model(rng)
    out = smplx_forward(m, betas=jnp.ones(10))
    shift = np.asarray(m.shapedirs) @ np.ones(10)
    np.testing.assert_allclose(
        np.asarray(out.vertices), np.asarray(m.v_template) + shift, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.shape_offsets), shift, atol=1e-6)


def test_skeleton_scaling_invariants(rng):
    m = make_test_model(rng)
    sk = Skeleton(_test_model=m)
    sk.forward_smplx()
    ext = sk.vertices.max(0) - sk.vertices.min(0)
    np.testing.assert_allclose(ext.max(), 0.6, rtol=1e-5)
    v0 = sk.vertices.copy()
    sk.scale(-10)
    np.testing.assert_allclose(sk.vertices, v0 * 1.1 ** 10, rtol=1e-6)
    assert sk.points3d.shape == (18, 3)
    assert sk.hand_centers.shape == (2, 3)
    mn, mx = sk.torso_bbox
    assert ((mx - mn) >= 0.8 - 1e-6).all()


def test_skeleton_sampling(rng):
    m = make_test_model(rng)
    sk = Skeleton(_test_model=m)
    sk.forward_smplx()
    pts = sk.sample_smplx_points(500)
    assert pts.shape == (500, 3)
    # samples lie within the mesh bbox
    assert (pts >= sk.vertices.min(0) - 1e-5).all()
    assert (pts <= sk.vertices.max(0) + 1e-5).all()


def test_apose_values():
    bp = apose_body_pose()
    assert bp[15, 2] == -math.pi / 4 and bp[16, 2] == math.pi / 4
    assert bp[19, 0] == 1.0 and bp[20, 0] == 1.0


def _front_mvp():
    """Simple GL-ish mvp looking down -x at the origin."""
    from gaussianip_tpu.ops.camera_math import (
        get_mvp_matrix,
        gl_projection_matrix,
        look_at_c2w,
    )

    eye = jnp.array([[2.0, 0.0, 0.0]])
    c2w = look_at_c2w(eye, jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1]]))
    proj = gl_projection_matrix(jnp.array([1.0]), 1.0, 0.1, 1000.0)
    return get_mvp_matrix(c2w, proj)[0]


def test_openpose_draw_basic(rng):
    pts = rng.uniform(-0.3, 0.3, (18, 3)).astype(np.float32)
    mvp = _front_mvp()
    canvas, all_vis, kps = openpose_draw(
        jnp.asarray(pts), mvp, jnp.float32(0.0), jnp.array(False), 64, 64
    )
    assert canvas.shape == (64, 64, 3)
    assert float(canvas.max()) > 0.5  # something was drawn
    assert float(all_vis) in (0.0, 1.0)
    # the nose circle lands where projected (if visible)
    x, y = int(kps[0, 0]), int(kps[0, 1])
    if 4 <= x < 60 and 4 <= y < 60 and float(all_vis) == 1.0:
        px = np.asarray(canvas[y, x])
        assert px.max() > 0.3


def test_openpose_head_zoom_mask(rng):
    pts = np.zeros((18, 3), np.float32)
    pts[:, 1] = np.linspace(-0.3, 0.3, 18)
    mvp = _front_mvp()
    canvas_hz, all_vis, _ = openpose_draw(
        jnp.asarray(pts), mvp, jnp.float32(30.0), jnp.array(True), 64, 64
    )
    # head zoom hides most joints -> all_vis must be 0
    assert float(all_vis) == 0.0


def test_humansd_draw(rng):
    from gaussianip_tpu.human.posemap import humansd_draw

    pts = rng.uniform(-0.3, 0.3, (18, 3)).astype(np.float32)
    mvp = _front_mvp()
    canvas, kp = humansd_draw(jnp.asarray(pts), mvp, 64, 64)
    assert canvas.shape == (64, 64, 3)
    assert kp.shape == (1, 17, 3)
    assert float(canvas.max()) > 0.3  # limbs drawn
    assert np.all(np.asarray(kp[0, :, 2]) == 1.0)  # no occlusion by default

    # back view: nose behind both ears -> nose/eyes confidence zeroed
    pts2 = pts.copy()
    # ears (op18 idx 16, 17) in front of nose (idx 0) along the view dir (+x)
    pts2[0, 0] = -0.5
    pts2[16, 0] = 0.4
    pts2[17, 0] = 0.4
    _, kp2 = humansd_draw(jnp.asarray(pts2), mvp, 64, 64,
                          enable_occlusion=True)
    conf = np.asarray(kp2[0, :, 2])
    assert conf[0] == 0.0 and conf[1] == 0.0 and conf[2] == 0.0
