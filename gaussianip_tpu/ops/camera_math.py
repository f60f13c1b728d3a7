"""Camera matrix math.

Two projection conventions coexist, exactly as in the reference:
  * the splat-rasterizer convention (reference:
    gaussiansplatting/utils/graphics_utils.py:73-99,
    gaussiansplatting/scene/cameras.py:17-52) — matrices stored TRANSPOSED and
    applied to row vectors (p_row @ M);
  * the threestudio convention used for SMPL-X pose-map projection (reference:
    threestudio/utils/ops.py:266-293) — OpenGL-ish with flipped y.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def fov2focal(fov, pixels):
    return pixels / (2 * jnp.tan(fov / 2))


def focal2fov(focal, pixels):
    return 2 * jnp.arctan(pixels / (2 * focal))


def splat_projection_matrix(znear, zfar, fovx, fovy):
    """Perspective projection, splat-rasterizer convention (NOT transposed).

    reference: gaussiansplatting/utils/graphics_utils.py:73-93.
    """
    tan_y = jnp.tan(fovy / 2)
    tan_x = jnp.tan(fovx / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = jnp.zeros((4, 4), jnp.float32)
    P = P.at[0, 0].set(znear / right)
    P = P.at[1, 1].set(znear / top)
    P = P.at[3, 2].set(1.0)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    return P


def rectified_w2c(c2w):
    """w2c with the reference's sign rectification (reference:
    gaussiansplatting/scene/cameras.py:23-27): invert c2w, then negate rows 1:3
    of the rotation block and the whole translation column."""
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    Rt = R.T
    tw = -Rt @ t
    w2c = jnp.zeros((4, 4), jnp.float32)
    w2c = w2c.at[:3, :3].set(Rt)
    w2c = w2c.at[:3, 3].set(tw)
    w2c = w2c.at[3, 3].set(1.0)
    w2c = w2c.at[1:3, :3].multiply(-1.0)
    w2c = w2c.at[:3, 3].multiply(-1.0)
    return w2c


def camera_matrices(c2w, fovy, height: int, width: int, znear=0.01, zfar=100.0):
    """Build (world_view^T, full_proj^T, camera_center, fovx) for one camera.

    Mirrors reference gaussiansplatting/scene/cameras.py:17-52: FoVx derived
    from FoVy via the focal of the *height* ("focal2fov(fov2focal(FoVy,
    height), width)"), matrices stored transposed for row-vector use.
    """
    fovx = focal2fov(fov2focal(fovy, height), width)
    w2c = rectified_w2c(c2w)
    world_view_t = w2c.T
    proj = splat_projection_matrix(znear, zfar, fovx, fovy)
    full_proj_t = world_view_t @ proj.T
    cam_center = jnp.linalg.inv(world_view_t)[3, :3]
    return world_view_t, full_proj_t, cam_center, fovx


def gl_projection_matrix(fovy, aspect_wh, near, far):
    """threestudio projection for MVP / pose-map joints, batched over fovy.

    reference: threestudio/utils/ops.py:266-278 (note the negated [1,1] entry).
    """
    fovy = jnp.asarray(fovy)
    B = fovy.shape[0]
    z = jnp.zeros((B,), jnp.float32)
    t = jnp.tan(fovy / 2.0)
    rows = [
        jnp.stack([1.0 / (t * aspect_wh), z, z, z], -1),
        jnp.stack([z, -1.0 / t, z, z], -1),
        jnp.stack([z, z, -(far + near) / (far - near) * jnp.ones_like(z),
                   -2.0 * far * near / (far - near) * jnp.ones_like(z)], -1),
        jnp.stack([z, z, -jnp.ones_like(z), z], -1),
    ]
    return jnp.stack(rows, -2)


def get_mvp_matrix(c2w, proj_mtx):
    """MVP = proj @ w2c, batched. reference: threestudio/utils/ops.py:281-292."""
    R = c2w[:, :3, :3]
    t = c2w[:, :3, 3:]
    w2c = jnp.zeros_like(c2w)
    w2c = w2c.at[:, :3, :3].set(jnp.swapaxes(R, -1, -2))
    w2c = w2c.at[:, :3, 3:].set(-jnp.swapaxes(R, -1, -2) @ t)
    w2c = w2c.at[:, 3, 3].set(1.0)
    return proj_mtx @ w2c


def look_at_c2w(camera_positions, centers, up):
    """Batched c2w from eye/center/up with the reference's column layout
    [right, up, -lookat | eye] (reference: threestudio/data/camera_data.py:448-454)."""

    def norm(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)

    lookat = norm(centers - camera_positions)
    right = norm(jnp.cross(lookat, up))
    up2 = norm(jnp.cross(right, lookat))
    rot = jnp.stack([right, up2, -lookat], axis=-1)
    c2w = jnp.concatenate([rot, camera_positions[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(c2w[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([c2w, bottom], axis=-2)


def spherical_to_position(elevation, azimuth, distance):
    """(elev, azim, r) -> xyz, +z up, azimuth from +x toward +y.
    reference: threestudio/data/camera_data.py:367-374."""
    return jnp.stack(
        [
            distance * jnp.cos(elevation) * jnp.cos(azimuth),
            distance * jnp.cos(elevation) * jnp.sin(azimuth),
            distance * jnp.sin(elevation),
        ],
        -1,
    )


def deg2rad(x):
    return jnp.asarray(x) * (math.pi / 180.0)
