import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.human.animation import AvatarAnimator, load_animation_ply
from gaussianip_tpu.human.smplx_jax import make_test_model
from gaussianip_tpu.model import ply as ply_io
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.triangle import (
    closest_point_barycentric,
    signed_distance_to_mesh,
)


def test_closest_point_regions():
    a = jnp.array([0.0, 0, 0])
    b = jnp.array([1.0, 0, 0])
    c = jnp.array([0.0, 1, 0])
    # interior point projects onto the face
    uvw = closest_point_barycentric(jnp.array([0.25, 0.25, 1.0]), a, b, c)
    np.testing.assert_allclose(np.asarray(uvw), [0.5, 0.25, 0.25], atol=1e-6)
    # vertex regions
    uvw = closest_point_barycentric(jnp.array([-1.0, -1.0, 0.0]), a, b, c)
    np.testing.assert_allclose(np.asarray(uvw), [1, 0, 0], atol=1e-6)
    uvw = closest_point_barycentric(jnp.array([2.0, -0.5, 0.0]), a, b, c)
    np.testing.assert_allclose(np.asarray(uvw), [0, 1, 0], atol=1e-6)
    # edge ab region
    uvw = closest_point_barycentric(jnp.array([0.5, -1.0, 0.0]), a, b, c)
    np.testing.assert_allclose(np.asarray(uvw), [0.5, 0.5, 0], atol=1e-6)


def test_signed_distance_brute_force(rng):
    verts = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, 30, (40, 3)).astype(np.int32))
    pts = jnp.asarray(rng.normal(size=(25, 3)).astype(np.float32) * 1.5)
    d, fi, uvw = signed_distance_to_mesh(pts, verts, faces, face_block=16)
    # reconstruction: |bary point + d*n - p| == 0 only if p is on the normal
    # line; but |d| must equal the true min distance
    fa = np.asarray(faces)[np.asarray(fi)]
    v0 = np.asarray(verts)[fa[:, 0]]
    v1 = np.asarray(verts)[fa[:, 1]]
    v2 = np.asarray(verts)[fa[:, 2]]
    u = np.asarray(uvw)
    cp = u[:, :1] * v0 + u[:, 1:2] * v1 + u[:, 2:3] * v2
    got = np.linalg.norm(np.asarray(pts) - cp, axis=1)
    np.testing.assert_allclose(np.abs(np.asarray(d)), got, atol=1e-5)
    # brute force with dense evaluation
    a = np.asarray(verts)[np.asarray(faces)[:, 0]]
    b = np.asarray(verts)[np.asarray(faces)[:, 1]]
    c = np.asarray(verts)[np.asarray(faces)[:, 2]]
    uvw_all = np.asarray(closest_point_barycentric(
        jnp.asarray(pts)[:, None], jnp.asarray(a)[None], jnp.asarray(b)[None],
        jnp.asarray(c)[None]))
    cp_all = (uvw_all[..., :1] * a[None] + uvw_all[..., 1:2] * b[None]
              + uvw_all[..., 2:3] * c[None])
    d_all = np.linalg.norm(np.asarray(pts)[:, None] - cp_all, axis=-1)
    np.testing.assert_allclose(np.abs(np.asarray(d)), d_all.min(1), atol=1e-5)


def test_animation_ply_shim(tmp_path, rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    st = create_from_pcd(pts, np.full((20, 3), 0.5, np.float32), 32,
                         rng.uniform(0.01, 0.1, 20))
    p = str(tmp_path / "a.ply")
    ply_io.state_to_ply(st, p)
    st2 = load_animation_ply(p)
    x2 = np.asarray(st2.xyz[:20])
    np.testing.assert_allclose(x2[:, 1], pts[:, 2], atol=1e-6)
    np.testing.assert_allclose(x2[:, 2], pts[:, 1], atol=1e-6)
    r2 = np.asarray(st2.rotation[:20])
    np.testing.assert_allclose(r2[:, 0], -1.0, atol=1e-6)  # w negated


def test_animator_bind_and_repose(rng):
    m = make_test_model(rng, n_verts=120, n_faces=150)
    # gaussians sampled near the template surface -> binding error small
    tpl = np.asarray(m.v_template)
    fidx = rng.integers(0, 150, 300)
    faces = np.asarray(m.faces)
    bary = rng.dirichlet((1, 1, 1), 300).astype(np.float32)
    # place gaussians exactly on the FIRST posed/scaled mesh so binding error
    # is ~0: compute the frame-0 mesh the animator will build
    motion = rng.normal(0, 0.05, (5, 55, 3)).astype(np.float32)
    st0 = create_from_pcd(np.zeros((1, 3), np.float32),
                          np.full((1, 3), 0.5, np.float32), 512, [0.01])
    anim = AvatarAnimator(st0, m, motion_poses=motion)
    verts0 = np.asarray(anim._mesh_at(0))
    pts = (bary[:, :1] * verts0[faces[fidx, 0]]
           + bary[:, 1:2] * verts0[faces[fidx, 1]]
           + bary[:, 2:3] * verts0[faces[fidx, 2]]).astype(np.float32)
    st = create_from_pcd(pts, np.full((300, 3), 0.5, np.float32), 512,
                         rng.uniform(1e-4, 1e-3, 300))
    anim.gaussians = st
    culled = anim.bind(0, face_block=64)
    n = int(anim.gaussians.n_active)
    assert n >= 250  # most points survive (on-surface)
    assert culled == 300 - n
    xyz0 = np.asarray(anim.gaussians.xyz[:n])
    anim.repose(3)
    xyz3 = np.asarray(anim.gaussians.xyz[:n])
    assert np.abs(xyz3 - xyz0).max() > 1e-4  # pose moved the gaussians
    img = anim.render_frame(30.0, height=64, width=64,
                            render_cfg=None)
    assert img.shape == (64, 64, 3)


def test_animator_accepts_flat_amass_poses(rng):
    # raw AMASS stores poses [T, 165] flat; the bundled reference motions
    # are pre-reshaped [T, 55, 3] — both layouts must load identically
    m = make_test_model(rng, n_verts=60, n_faces=80)
    st = create_from_pcd(np.zeros((4, 3), np.float32),
                         np.full((4, 3), 0.5, np.float32), 64,
                         [0.01] * 4)
    motion3 = rng.normal(0, 0.05, (3, 55, 3)).astype(np.float32)
    a1 = AvatarAnimator(st, m, motion_poses=motion3)
    a2 = AvatarAnimator(st, m, motion_poses=motion3.reshape(3, 165))
    np.testing.assert_array_equal(a1.motion, a2.motion)
    assert a1.motion.shape == (3, 21, 3)
