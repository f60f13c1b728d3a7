"""Rotation / covariance / activation math for 3D Gaussian splats.

Pure-JAX, shape-polymorphic, fully differentiable. Semantics mirror the
reference's gaussian parametrization (reference:
gaussiansplatting/scene/gaussian_model.py:15-31,
gaussiansplatting/utils/general_utils.py build_rotation/build_scaling_rotation)
but are written batch-first for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def quat_to_rotmat(q):
    """Unnormalized quaternion(s) [..., 4] (w, x, y, z) -> rotation [..., 3, 3].

    Normalizes internally (the reference's rotation activation is L2-normalize,
    reference: gaussian_model.py:30).
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1
    )
    r1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1
    )
    r2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([r0, r1, r2], -2)


def build_scaling_rotation(scales, quats):
    """L = R @ diag(s): [..., 3, 3]."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def build_covariance(scales, quats, scaling_modifier=1.0):
    """3D covariance Sigma = L L^T from activated scales + raw quats."""
    L = build_scaling_rotation(scaling_modifier * scales, quats)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov):
    """[..., 3, 3] symmetric -> packed [..., 6] (upper triangle, row-major:
    xx, xy, xz, yy, yz, zz) matching the reference's packed layout."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        -1,
    )


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Exponential log-lerp LR schedule (reference:
    gaussiansplatting/utils/general_utils.py get_expon_lr_func). jnp-traceable.
    """
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return delay_rate * log_lerp
