"""OpenPose skeleton-map rendering in pure JAX (jittable, batchable).

Behavioral rebuild of the reference's cv2 drawing (reference:
threestudio/utils/poser.py:832-904): project the 18 keypoints by the MVP,
apply azimuth/depth occlusion rules, draw radius-4 colored circles and
ellipse limbs with the 0.4/0.6 alpha blend. The reference does this on the
host with cv2 per camera (a device->host sync every training step,
GaussianIP.py:178,194); here it is an analytic rasterization over the pixel
grid that fuses into the jitted train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .skeleton import OPENPOSE18_COLORS, OPENPOSE18_LINES

_COLORS = jnp.asarray(OPENPOSE18_COLORS / 255.0)
_LINES = OPENPOSE18_LINES
# head-zoom visible set: nose, neck, r_elbow, l_elbow, eyes, ears
# (reference: poser.py:843-852)
_HEAD_ZOOM_VIS = np.zeros(18, bool)
_HEAD_ZOOM_VIS[[0, 1, 3, 6, 14, 15, 16, 17]] = True


def occlusion_mask(points_ndc, xs, ys, azimuth_deg, head_zoom, height, width):
    """Visibility per keypoint (reference: poser.py:840-875). points_ndc:
    [18, 3]; azimuth in degrees; head_zoom bool scalar."""
    mask = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
    mask = jnp.where(head_zoom, jnp.asarray(_HEAD_ZOOM_VIS), mask)

    az = azimuth_deg
    mask = mask.at[16].set(mask[16] & ~((az > 0) & (az < 60)))
    mask = mask.at[17].set(mask[17] & ~((az > 120) & (az < 180)))

    z = points_ndc[:, 2]
    left_view = (z[0] > z[17]) & (z[0] < z[16])
    right_view = (~left_view) & (z[0] < z[17]) & (z[0] > z[16])
    back_view = (~left_view) & (~right_view) & (z[0] > z[17]) & (z[0] > z[16])

    mask = mask.at[16].set(mask[16] & ~left_view)
    mask = mask.at[14].set(mask[14] & ~left_view & ~back_view)
    mask = mask.at[15].set(mask[15] & ~(left_view & (az < 0)))

    mask = mask.at[17].set(mask[17] & ~right_view)
    mask = mask.at[15].set(mask[15] & ~right_view & ~back_view)
    mask = mask.at[14].set(mask[14] & ~(right_view & (az < 0) & (az != -180.0)))

    mask = mask.at[0].set(mask[0] & ~back_view)
    return mask


@functools.partial(jax.jit, static_argnames=("height", "width"))
def openpose_draw(points3d, mvp, azimuth_deg, head_zoom, height: int, width: int):
    """points3d: [18, 3] world keypoints; mvp: [4, 4] (threestudio GL
    convention). Returns (canvas [H, W, 3] float, all_vis scalar {0,1},
    kps2d [18, 2])."""
    pts_h = jnp.concatenate([points3d, jnp.ones_like(points3d[:, :1])], axis=1)
    proj = pts_h @ mvp.T
    ndc = proj[:, :3] / proj[:, 3:]
    xs = (ndc[:, 0] + 1) / 2 * width
    ys = (ndc[:, 1] + 1) / 2 * height
    mask = occlusion_mask(ndc, xs, ys, azimuth_deg, head_zoom, height, width)

    px = jnp.arange(width, dtype=jnp.float32)[None, :]  # [1, W]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]  # [H, 1]
    canvas = jnp.zeros((height, width, 3), jnp.float32)

    # circles, radius 4, integer-cast centers (reference: poser.py:878-881)
    cx = jnp.floor(xs)
    cy = jnp.floor(ys)
    for i in range(18):
        inside = ((px - cx[i]) ** 2 + (py - cy[i]) ** 2) <= 16.0
        inside = inside & mask[i]
        canvas = jnp.where(inside[..., None], _COLORS[i], canvas)

    # ellipse limbs blended 0.4 old + 0.6 color (reference: poser.py:884-898)
    for i in range(len(_LINES)):
        a_idx, b_idx = int(_LINES[i, 0]), int(_LINES[i, 1])
        visible = mask[a_idx] & mask[b_idx]
        X = jnp.stack([xs[a_idx], xs[b_idx]])
        Y = jnp.stack([ys[a_idx], ys[b_idx]])
        mX = jnp.floor(jnp.mean(X))
        mY = jnp.floor(jnp.mean(Y))
        length = jnp.sqrt((Y[0] - Y[1]) ** 2 + (X[0] - X[1]) ** 2)
        semi_a = jnp.maximum(jnp.floor(length / 2), 1e-3)
        ang = jnp.arctan2(Y[0] - Y[1], X[0] - X[1])
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        dx = px - mX
        dy = py - mY
        xr = ca * dx + sa * dy
        yr = -sa * dx + ca * dy
        inside = (xr / semi_a) ** 2 + (yr / 4.0) ** 2 <= 1.0
        inside = inside & visible
        canvas = jnp.where(
            inside[..., None], 0.4 * canvas + 0.6 * _COLORS[i], canvas
        )

    all_vis = jnp.all(mask).astype(jnp.float32)
    return canvas, all_vis, jnp.stack([xs, ys], axis=1)
