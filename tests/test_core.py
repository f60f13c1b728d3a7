import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.ops import sh as sh_mod
from gaussianip_tpu.ops.knn import knn_self_dist2, mean_dist2_3nn
from gaussianip_tpu.ops.transforms import (
    build_covariance,
    expon_lr,
    inverse_sigmoid,
    quat_to_rotmat,
)


def test_quat_to_rotmat_orthonormal(rng):
    q = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    R = quat_to_rotmat(q)
    eye = jnp.eye(3)[None].repeat(64, 0)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_identity_quat_identity_rot():
    R = quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)


def test_covariance_psd(rng):
    s = jnp.exp(jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32)))
    q = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    cov = build_covariance(s, q)
    eig = np.linalg.eigvalsh(np.asarray(cov))
    assert (eig > -1e-6).all()
    # eigenvalues are the squared scales
    np.testing.assert_allclose(np.sort(eig, -1), np.sort(np.asarray(s) ** 2, -1),
                               rtol=1e-3)


def test_expon_lr_endpoints():
    # reference schedule: position_lr 5e-5 -> 2.5e-5 over 30k steps
    lr0 = expon_lr(0, 5e-5, 2.5e-5, max_steps=30000)
    lrN = expon_lr(30000, 5e-5, 2.5e-5, max_steps=30000)
    np.testing.assert_allclose(float(lr0), 5e-5, rtol=1e-5)
    np.testing.assert_allclose(float(lrN), 2.5e-5, rtol=1e-5)
    mid = expon_lr(15000, 5e-5, 2.5e-5, max_steps=30000)
    np.testing.assert_allclose(float(mid), np.sqrt(5e-5 * 2.5e-5), rtol=1e-5)


def test_inverse_sigmoid_roundtrip():
    x = jnp.array([0.01, 0.1, 0.5, 0.9, 0.99])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x), rtol=1e-6
    )


def test_sh_deg0_constant(rng):
    coeffs = jnp.asarray(rng.normal(size=(10, 3, 1)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    out = sh_mod.eval_sh(0, coeffs, dirs)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(coeffs[..., 0]) * sh_mod.C0, rtol=1e-6)


def test_sh_rgb_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(0, 1, (16, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sh_mod.sh_to_rgb(sh_mod.rgb_to_sh(rgb))), np.asarray(rgb),
        atol=1e-6,
    )


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    d2, idx = knn_self_dist2(jnp.asarray(pts), k=3, block=64)
    # numpy brute force
    D = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(D, np.inf)
    ref = np.sort(D, axis=1)[:, :3]
    np.testing.assert_allclose(np.asarray(d2), ref, rtol=1e-3, atol=1e-5)
    m = mean_dist2_3nn(jnp.asarray(pts), block=64)
    np.testing.assert_allclose(np.asarray(m), ref.mean(1), rtol=1e-3, atol=1e-5)
