"""Rotation representation conversions (quaternion / matrix / axis-angle /
euler / 6D), pure JAX, batched.

Behavioral rebuild of the reference's pytorch3d-style rotation utilities
(reference: utils/rotations.py:45-679) used by the avatar LBS animation path.
Quaternions are (w, x, y, z), matching the splat attributes."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transforms import quat_to_rotmat  # noqa: F401 (re-export)


def rotmat_to_quat(R):
    """[..., 3, 3] -> [..., 4] (w, x, y, z), numerically robust branch-free
    variant of the standard Shepperd method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1 + tr) / 2
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], -1)
    qx1 = safe_sqrt(1 + m00 - m11 - m22) / 2
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], -1)
    qy2 = safe_sqrt(1 - m00 + m11 - m22) / 2
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], -1)
    qz3 = safe_sqrt(1 - m00 - m11 + m22) / 2
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], -1)

    cond0 = (tr > 0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_multiply(a, b):
    """Hamilton product, (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def quat_invert(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def axis_angle_to_quat(aa):
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = angle / 2
    small = angle < 1e-8
    k = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, angle))
    return jnp.concatenate([jnp.cos(half), aa * k], -1)


def quat_to_axis_angle(q):
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = 2 * jnp.arctan2(sin_half[..., 0], q[..., 0])[..., None]
    small = sin_half < 1e-8
    axis = q[..., 1:] / jnp.where(small, 1.0, sin_half)
    return jnp.where(small, q[..., 1:] * 2, axis * angle)


def axis_angle_to_matrix(aa):
    from ..human.smplx_jax import rodrigues

    return rodrigues(aa)


def matrix_to_axis_angle(R):
    return quat_to_axis_angle(rotmat_to_quat(R))


def euler_to_matrix(angles, convention: str = "XYZ"):
    """Intrinsic euler angles [..., 3] -> rotation matrices."""
    def rot_axis(axis, a):
        c, s = jnp.cos(a), jnp.sin(a)
        o, z = jnp.ones_like(a), jnp.zeros_like(a)
        if axis == "X":
            rows = [[o, z, z], [z, c, -s], [z, s, c]]
        elif axis == "Y":
            rows = [[c, z, s], [z, o, z], [-s, z, c]]
        else:
            rows = [[c, -s, z], [s, c, z], [z, z, o]]
        return jnp.stack([jnp.stack(r, -1) for r in rows], -2)

    R = rot_axis(convention[0], angles[..., 0])
    for i, ax in enumerate(convention[1:], 1):
        R = R @ rot_axis(ax, angles[..., i])
    return R


def matrix_to_rotation_6d(R):
    """[..., 3, 3] -> [..., 6]: first two rows flattened (Zhou et al.)."""
    return R[..., :2, :].reshape(R.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6):
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-12)
    a2 = a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1
    b2 = a2 / (jnp.linalg.norm(a2, axis=-1, keepdims=True) + 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], -2)
