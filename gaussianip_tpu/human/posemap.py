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

import colorsys
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .skeleton import OPENPOSE18_COLORS, OPENPOSE18_LINES

# numpy at import: a module-level jnp.asarray would CREATE the
# backend on import (and hang every `import gaussianip_tpu.*` when
# the TPU tunnel is unreachable); jnp converts inside the jits
_COLORS = np.asarray(OPENPOSE18_COLORS / 255.0)
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
        canvas = jnp.where(inside[..., None], jnp.asarray(_COLORS)[i], canvas)

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
            inside[..., None], 0.4 * canvas + 0.6 * jnp.asarray(_COLORS)[i],
            canvas
        )

    all_vis = jnp.all(mask).astype(jnp.float32)
    return canvas, all_vis, jnp.stack([xs, ys], axis=1)


# ---------------------------------------------------------------------------
# humansd variant (reference: poser.py:906-945 + draw_humansd_skeleton at
# poser.py:502-543): 17 COCO keypoints, 16 thick limb lines in an HLS palette,
# endpoint dots, painter's-order overwrite (no alpha blending).

# COCO-17 selected from the stored OpenPose-18 keypoints (the reference maps
# SMPL-X joints straight to COCO via joint_mapper_smplx_to_humansd17,
# poser.py:569-590 — identical joint set, neck dropped)
_HUMANSD17_FROM_OP18 = np.array(
    [0, 15, 14, 17, 16, 5, 2, 6, 3, 7, 4, 11, 8, 12, 9, 13, 10], np.int32
)

# [idx, a, b] edges (reference: poser.py:503-520)
_HUMANSD_EDGES = np.array([
    [1, 0, 1], [0, 0, 2], [3, 1, 3], [2, 2, 4], [5, 3, 5], [4, 4, 6],
    [7, 5, 7], [6, 6, 8], [9, 7, 9], [8, 8, 10], [11, 5, 11], [10, 6, 12],
    [13, 11, 13], [12, 12, 14], [15, 13, 15], [14, 14, 16],
], np.int32)


def _hls_palette(n: int):
    """seaborn.color_palette("hls", n) (reference: poser.py:522): evenly
    spaced hues offset by 0.01, lightness 0.6, saturation 0.65."""
    hues = (np.linspace(0, 1, n + 1)[:-1] + 0.01) % 1.0
    return np.array([colorsys.hls_to_rgb(h, 0.6, 0.65) for h in hues],
                    np.float32)


_HUMANSD_COLORS = np.floor(_hls_palette(len(_HUMANSD_EDGES)) * 255.0) / 255.0


@functools.partial(jax.jit, static_argnames=("height", "width",
                                              "enable_occlusion"))
def humansd_draw(points3d, mvp, height: int, width: int,
                 enable_occlusion: bool = False):
    """HumanSD-style COCO-17 skeleton map (reference: poser.py:906-945).

    points3d: [18, 3] OpenPose-18 world keypoints (the COCO subset is
    selected internally); mvp: [4, 4]. Returns (canvas [H, W, 3] float,
    kp [1, 17, 3] (x, y, conf)). NOTE: the reference scales x by H and y by
    W (poser.py:911-912) — replicated verbatim; identical for square maps.
    """
    pts18_h = jnp.concatenate(
        [points3d, jnp.ones_like(points3d[:, :1])], axis=1)
    pts = (pts18_h @ mvp.T)[_HUMANSD17_FROM_OP18]
    ndc = pts[:, :3] / pts[:, 3:]
    xs = (ndc[:, 0] + 1) / 2 * height
    ys = (ndc[:, 1] + 1) / 2 * width

    conf = jnp.ones((17,), jnp.float32)
    if enable_occlusion:
        z = ndc[:, 2]
        left_view = (z[0] > z[3]) & (z[0] < z[4])
        right_view = (~left_view) & (z[0] < z[3]) & (z[0] > z[4])
        back_view = (~left_view) & (~right_view) & (z[0] > z[3]) & (z[0] > z[4])
        conf = conf.at[4].set(jnp.where(left_view, 0.0, conf[4]))
        conf = conf.at[2].set(
            jnp.where(left_view & (xs[2] > xs[1]), 0.0, conf[2]))
        conf = conf.at[3].set(jnp.where(right_view, 0.0, conf[3]))
        conf = conf.at[1].set(
            jnp.where(right_view & (xs[1] < xs[2]), 0.0, conf[1]))
        for i in (0, 1, 2):
            conf = conf.at[i].set(jnp.where(back_view, 0.0, conf[i]))

    w_line = int(10 * height / 512)
    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]
    canvas = jnp.zeros((height, width, 3), jnp.float32)

    # integer-cast endpoints (cv2 semantics, poser.py:528-530)
    ix = jnp.floor(xs)
    iy = jnp.floor(ys)
    half = w_line / 2.0
    rdot = float(w_line // 2)
    for idx, a, b in _HUMANSD_EDGES:
        idx, a, b = int(idx), int(a), int(b)
        vis = (conf[a] > 0.3) & (conf[b] > 0.3)
        ax, ay, bx, by = ix[a], iy[a], ix[b], iy[b]
        # capsule of radius w/2 around segment ab (cv2 thick line + the two
        # endpoint circles the reference draws at radius w//2)
        dx, dy = bx - ax, by - ay
        len2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
        t = jnp.clip(((px - ax) * dx + (py - ay) * dy) / len2, 0.0, 1.0)
        qx = ax + t * dx
        qy = ay + t * dy
        d2 = (px - qx) ** 2 + (py - qy) ** 2
        inside = (d2 <= half * half) & vis
        dot = (((px - ax) ** 2 + (py - ay) ** 2) <= rdot * rdot) | (
            ((px - bx) ** 2 + (py - by) ** 2) <= rdot * rdot)
        inside = inside | (dot & vis)
        canvas = jnp.where(inside[..., None],
                           jnp.asarray(_HUMANSD_COLORS)[idx], canvas)

    kp = jnp.concatenate(
        [jnp.stack([xs, ys], axis=1), conf[:, None]], axis=1)[None]
    return canvas, kp
