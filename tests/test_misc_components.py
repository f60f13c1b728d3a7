"""Rotations lib, Adan, patch sampler, mesh extraction, LBS diffusion."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.data.patch_sampler import sample_patches
from gaussianip_tpu.human.lbs_deform import LBSDeformer, lbs_diffuse_transforms
from gaussianip_tpu.human.smplx_jax import make_test_model, smplx_forward
from gaussianip_tpu.model.adan import adan
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.mesh_extract import (
    extract_mesh,
    marching_tetrahedra,
    save_obj,
)
from gaussianip_tpu.ops.rotations import (
    axis_angle_to_quat,
    euler_to_matrix,
    matrix_to_rotation_6d,
    quat_multiply,
    quat_to_axis_angle,
    quat_to_rotmat,
    rotation_6d_to_matrix,
    rotmat_to_quat,
)


def test_rotation_roundtrips(rng):
    from scipy.spatial.transform import Rotation

    q = rng.normal(size=(32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q *= np.where(q[:, :1] < 0, -1, 1)
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(rotmat_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-4)

    aa = rng.normal(size=(16, 3)).astype(np.float32)
    qa = axis_angle_to_quat(jnp.asarray(aa))
    R_ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(np.asarray(quat_to_rotmat(qa)), R_ref, atol=1e-5)
    aa2 = np.asarray(quat_to_axis_angle(qa))
    R2 = Rotation.from_rotvec(aa2).as_matrix()
    np.testing.assert_allclose(R2, R_ref, atol=1e-4)

    # quat multiply == matrix multiply
    qb = axis_angle_to_quat(jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32)))
    Rab = np.asarray(quat_to_rotmat(quat_multiply(qa, qb)))
    np.testing.assert_allclose(
        Rab, np.asarray(quat_to_rotmat(qa)) @ np.asarray(quat_to_rotmat(qb)),
        atol=1e-4)

    # 6d roundtrip
    d6 = matrix_to_rotation_6d(jnp.asarray(R_ref.astype(np.float32)))
    R3 = np.asarray(rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(R3, R_ref, atol=1e-5)

    # euler
    ang = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
    Re = np.asarray(euler_to_matrix(jnp.asarray(ang), "XYZ"))
    Re_ref = Rotation.from_euler("XYZ", ang).as_matrix()
    np.testing.assert_allclose(Re, Re_ref, atol=1e-5)


def test_adan_converges(rng):
    import optax

    opt = adan(learning_rate=0.05)
    p = {"w": jnp.asarray(rng.normal(size=(8,)).astype(np.float32))}
    tgt = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    st = opt.init(p)

    @jax.jit
    def step(p, st):
        g = jax.grad(lambda p: jnp.sum((p["w"] - tgt) ** 2))(p)
        up, st = opt.update(g, st, p)
        return optax.apply_updates(p, up), st

    l0 = float(jnp.sum((p["w"] - tgt) ** 2))
    for _ in range(150):
        p, st = step(p, st)
    l1 = float(jnp.sum((p["w"] - tgt) ** 2))
    assert l1 < 0.01 * l0


def test_patch_sampler(rng):
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    mask = jnp.zeros((64, 64)).at[20:40, 20:40].set(1.0)
    patches, corners = sample_patches(jax.random.PRNGKey(0), img, mask, 16, 8)
    assert patches.shape == (8, 16, 16, 3)
    c = np.asarray(corners)
    # centers (corner + 8) land inside the mask region
    assert ((c + 8 >= 20) & (c + 8 < 40)).all()


def test_marching_tetrahedra_sphere():
    r = 24
    g = np.linspace(-1, 1, r)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    field = 1.0 - np.sqrt(x ** 2 + y ** 2 + z ** 2)  # iso 0.5 -> r=0.5 sphere
    verts, faces = marching_tetrahedra(field, 0.5)
    assert len(verts) > 100 and len(faces) > 100
    cell = 2.0 / (r - 1)
    world = verts * cell - 1.0
    radii = np.linalg.norm(world, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.05)


def test_extract_mesh_from_splats(tmp_path, rng):
    # dense ball of opaque splats -> extracted mesh approximates the ball
    n = 800
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    u = rng.uniform(0, 1, (n, 1)) ** (1 / 3)
    pts = (v * u * 0.3).astype(np.float32)
    gs = create_from_pcd(pts, np.full((n, 3), 0.5, np.float32), 1024,
                         np.full(n, 2e-3, np.float32))
    gs = gs.replace(opacity=jnp.full((1024, 1), 3.0))
    verts, faces = extract_mesh(gs, resolution=48, density_thresh=0.5, patch=6)
    assert len(verts) > 50
    assert np.linalg.norm(verts, axis=1).max() < 0.6
    p = save_obj(str(tmp_path / "m.obj"), verts, faces)
    assert open(p).readline().startswith("v ")


def test_lbs_diffuse_identity(rng):
    # identity vertex transforms diffuse to identity point transforms
    V, N = 50, 20
    lbs_w = jnp.asarray(rng.dirichlet(np.ones(5), V).astype(np.float32))
    T = jnp.tile(jnp.eye(4)[None], (V, 1, 1))
    tpl = jnp.asarray(rng.normal(size=(V, 3)).astype(np.float32))
    pts = tpl[:N] + 0.01
    out = lbs_diffuse_transforms(lbs_w, T, pts, tpl, K=4)
    np.testing.assert_allclose(np.asarray(out),
                               np.tile(np.eye(4)[None], (N, 1, 1)), atol=1e-5)


def test_lbs_deformer_moves_points(rng):
    m = make_test_model(rng, n_verts=150, n_faces=100)
    deformer = LBSDeformer(m)
    gs = create_from_pcd(np.asarray(m.v_template[:40]),
                         np.full((40, 3), 0.5, np.float32), 64,
                         rng.uniform(1e-4, 1e-3, 40))
    pose = jnp.asarray(rng.normal(0, 0.2, (21, 3)).astype(np.float32))
    # slice to active rows for the deform call
    gsl = gs.replace(xyz=gs.xyz[:40], rotation=gs.rotation[:40])
    new_xyz, new_rot = deformer.deform_gaussians(gsl, pose)
    assert new_xyz.shape == (40, 3)
    assert float(jnp.abs(new_xyz - gs.xyz[:40]).max()) > 1e-4
    # quaternions stay unit after composition
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(new_rot), axis=1), 1.0, atol=1e-3)
