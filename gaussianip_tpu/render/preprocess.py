"""Per-gaussian projection / culling / 2D-covariance stage of the rasterizer.

Pure differentiable JAX, vectorized over all gaussians (the reference does this
inside the CUDA forward preprocess of diff-gaussian-rasterization; math follows
the EWA-splatting formulation of the original 3DGS kernel — projection,
Jacobian-clamped 2D covariance with +0.3 px dilation, 3-sigma radius — consumed
at reference: gaussiansplatting/gaussian_renderer/__init__.py:85-93).

The `mean2d_offset_ndc` input reproduces the reference's screenspace-points
gradient trick (reference: gaussian_renderer/__init__.py:26-30): it is added to
the NDC xy before the pixel transform, so grads w.r.t. it are the NDC-space
viewspace gradients the densification statistics consume
(reference: GaussianIP.py:452-457, gaussian_model.py:420-422).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sh import eval_sh


class Projected(NamedTuple):
    mean2d: jnp.ndarray  # [N, 2] pixel coords
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (xx, xy, yy)
    color: jnp.ndarray  # [N, 3]
    opacity: jnp.ndarray  # [N]
    depth: jnp.ndarray  # [N] view-space z
    radius: jnp.ndarray  # [N] int32 pixel radius (0 = culled; classic 3-sigma
    #                      value, reported for densification stats)
    valid: jnp.ndarray  # [N] bool
    radius_bin: jnp.ndarray  # [N] int32 opacity-tightened radius for binning:
    #   alpha = opacity * exp(-q/2) < 1/255 outside q = 2 ln(255 opacity), and
    #   the compositor drops alpha < 1/255 anyway, so shrinking the footprint
    #   to min(3, sqrt(2 ln(255 op))) sigma is EXACT (the CUDA kernel uses a
    #   fixed 3 sigma and then discards those same pixels in-kernel)
    radius_cull: jnp.ndarray  # [N] int32 UNCAPPED alpha>=1/255 radius
    #   (sqrt(q_max) sigma, no 3-sigma clip) for binning's circle-vs-tile
    #   cull: bbox CORNER pixels can sit beyond 3 sigma yet inside sqrt(q_max)
    #   sigma when opacity > e^4.4/255 ~ 0.32, so culling with radius_bin
    #   would drop visible contributions; this radius never does


def ndc2pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    xyz,
    scales_act,
    quats,
    opacity_act,
    features,
    camera,
    active_sh_degree: int,
    scaling_modifier=1.0,
    mean2d_offset_ndc=None,
    override_color=None,
    active_mask=None,
):
    """Project gaussians into one camera. All inputs activated ([N,...]).

    All per-gaussian linear algebra is EXPANDED to scalar formulas over [N]
    arrays (as the CUDA preprocess does, forward.cu computeCov2D): batched
    [N,2,3]@[N,3,3] dot_generals with 2/3-wide contractions lower onto the
    MXU with the contraction padded to 128 — r4 probe_cut measured the
    projection stage ~100x off the VPU roofline in that form."""
    x_, y_, z_ = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    # row-vector transforms (matrices stored transposed): expand the
    # [N,4] @ [4,4] as 4-term scalar dots (contraction-4 matmuls pad to 128)
    fp = camera.full_proj_t
    p_hom3 = x_ * fp[0, 3] + y_ * fp[1, 3] + z_ * fp[2, 3] + fp[3, 3]
    p_w = 1.0 / (p_hom3 + 1e-7)
    p_proj = jnp.stack(
        [(x_ * fp[0, c] + y_ * fp[1, c] + z_ * fp[2, c] + fp[3, c]) * p_w
         for c in range(3)], -1)
    wv = camera.world_view_t
    pv_x = x_ * wv[0, 0] + y_ * wv[1, 0] + z_ * wv[2, 0] + wv[3, 0]
    pv_y = x_ * wv[0, 1] + y_ * wv[1, 1] + z_ * wv[2, 1] + wv[3, 1]
    pv_z = x_ * wv[0, 2] + y_ * wv[1, 2] + z_ * wv[2, 2] + wv[3, 2]
    depth = pv_z

    in_front = depth > 0.2

    # 2D covariance via clamped perspective Jacobian, fully expanded:
    # cov2d = A A^T where A = J @ R_cam @ L, L = R(q) diag(s)
    h, w = camera.height, camera.width
    tanx, tany = camera.tan_fovx, camera.tan_fovy
    focal_x = w / (2.0 * tanx)
    focal_y = h / (2.0 * tany)
    tz = pv_z
    limx, limy = 1.3 * tanx, 1.3 * tany
    tx = jnp.clip(pv_x / tz, -limx, limx) * tz
    ty = jnp.clip(pv_y / tz, -limy, limy) * tz

    # rotation entries from the (normalized) quaternion
    qn = quats / (jnp.linalg.norm(quats, axis=-1, keepdims=True) + 1e-12)
    qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    s0 = scaling_modifier * scales_act[:, 0]
    s1 = scaling_modifier * scales_act[:, 1]
    s2 = scaling_modifier * scales_act[:, 2]
    # L columns (R column c scaled by s_c)
    L = (
        ((1 - 2 * (qy * qy + qz * qz)) * s0, 2 * (qx * qy - qw * qz) * s1,
         2 * (qx * qz + qw * qy) * s2),
        (2 * (qx * qy + qw * qz) * s0, (1 - 2 * (qx * qx + qz * qz)) * s1,
         2 * (qy * qz - qw * qx) * s2),
        (2 * (qx * qz - qw * qy) * s0, 2 * (qy * qz + qw * qx) * s1,
         (1 - 2 * (qx * qx + qy * qy)) * s2),
    )
    # B = R_cam @ L with R_cam = world_view_t[:3,:3].T (scalar coefficients)
    B = tuple(
        tuple(wv[0, i] * L[0][c] + wv[1, i] * L[1][c] + wv[2, i] * L[2][c]
              for c in range(3))
        for i in range(3)
    )
    # A = J @ B with J = [[fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]]
    inv_tz = 1.0 / tz
    jx0 = focal_x * inv_tz
    jx2 = -(focal_x * tx) * inv_tz * inv_tz
    jy1 = focal_y * inv_tz
    jy2 = -(focal_y * ty) * inv_tz * inv_tz
    A0 = tuple(jx0 * B[0][c] + jx2 * B[2][c] for c in range(3))
    A1 = tuple(jy1 * B[1][c] + jy2 * B[2][c] for c in range(3))
    cxx = A0[0] * A0[0] + A0[1] * A0[1] + A0[2] * A0[2] + 0.3
    cyy = A1[0] * A1[0] + A1[1] * A1[1] + A1[2] * A1[2] + 0.3
    cxy = A0[0] * A1[0] + A0[1] * A1[1] + A0[2] * A1[2]

    det = cxx * cyy - cxy * cxy
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([cyy / det_safe, -cxy / det_safe, cxx / det_safe], -1)

    mid = 0.5 * (cxx + cyy)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam1))
    # +0.2 margin: pixels whose f32-computed alpha rounds up across the
    # 1/255 gate stay inside the footprint (boundary-flip protection)
    q_max = 2.0 * jnp.log(jnp.maximum(opacity_act * 255.0, 1e-12)) + 0.2
    sig_eff = jnp.sqrt(jnp.clip(q_max, 0.0, 9.0))
    radius_bin_f = jnp.ceil(sig_eff * jnp.sqrt(lam1))
    radius_cull_f = jnp.ceil(jnp.sqrt(jnp.maximum(q_max, 0.0) * lam1))

    ndc_xy = p_proj[:, :2]
    if mean2d_offset_ndc is not None:
        ndc_xy = ndc_xy + mean2d_offset_ndc
    mean2d = jnp.stack(
        [ndc2pix(ndc_xy[:, 0], w), ndc2pix(ndc_xy[:, 1], h)], -1
    )

    valid = in_front & det_ok
    if active_mask is not None:
        valid = valid & active_mask
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    valid = valid & (radius > 0)
    radius_bin = jnp.where(valid, radius_bin_f, 0.0).astype(jnp.int32)
    valid = valid & (radius_bin > 0)
    radius_cull = jnp.where(valid, radius_cull_f, 0.0).astype(jnp.int32)

    # colors: SH eval toward the camera (reference clamps sh2rgb + 0.5 at 0)
    if override_color is not None:
        color = override_color
    else:
        dir_pp = xyz - camera.camera_center[None, :]
        dir_pp = dir_pp / (jnp.linalg.norm(dir_pp, axis=-1, keepdims=True) + 1e-12)
        # features [N, K, 3] coeff-major -> eval_sh expects [..., C, K]
        sh = jnp.swapaxes(features, -1, -2)
        color = jnp.maximum(eval_sh(active_sh_degree, sh, dir_pp) + 0.5, 0.0)

    return Projected(
        mean2d=mean2d,
        conic=conic,
        color=color,
        opacity=opacity_act,
        depth=depth,
        radius=radius,
        valid=valid,
        radius_bin=radius_bin,
        radius_cull=radius_cull,
    )


def tile_rect(mean2d, radius, tile: int, n_tiles_x: int, n_tiles_y: int):
    """Integer tile rectangle per gaussian, CUDA getRect semantics:
    min inclusive, max exclusive, clamped to the grid."""
    r = radius.astype(jnp.float32)
    tmin_x = jnp.clip(jnp.floor((mean2d[:, 0] - r) / tile), 0, n_tiles_x).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((mean2d[:, 1] - r) / tile), 0, n_tiles_y).astype(jnp.int32)
    tmax_x = jnp.clip(
        jnp.floor((mean2d[:, 0] + r + tile - 1) / tile), 0, n_tiles_x
    ).astype(jnp.int32)
    tmax_y = jnp.clip(
        jnp.floor((mean2d[:, 1] + r + tile - 1) / tile), 0, n_tiles_y
    ).astype(jnp.int32)
    return tmin_x, tmin_y, tmax_x, tmax_y


def gaussian_power_coeffs(mean2d_local, conic, opacity):
    """Quadratic-form coefficients of log(alpha) in local pixel coords.

    power(x, y) = a0 + ax x + ay y + axx x^2 + axy x y + ayy y^2, with a0
    absorbing log(opacity), so alpha = exp(power). Enables the MXU-matmul
    alpha evaluation in the Pallas compositor ([G, 6] @ [6, P]).
    """
    mx, my = mean2d_local[..., 0], mean2d_local[..., 1]
    A, Bc, C = conic[..., 0], conic[..., 1], conic[..., 2]
    log_o = jnp.log(jnp.maximum(opacity, 1e-12))
    a0 = log_o - 0.5 * (A * mx * mx + C * my * my) - Bc * mx * my
    ax = A * mx + Bc * my
    ay = C * my + Bc * mx
    axx = -0.5 * A
    axy = -Bc
    ayy = -0.5 * C
    return jnp.stack([a0, ax, ay, axx, axy, ayy], -1)
