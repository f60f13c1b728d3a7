"""LBS-weight-diffused avatar deformation (the reference's `avatar/` path).

Behavioral rebuild of the experimental animation path B (reference:
avatar/__init__.py:400-652): instead of rigid closest-triangle binding
(human/animation.py), each gaussian receives a smooth per-point transform by
diffusing the SMPL-X vertices' LBS transforms through its K=6 nearest
template vertices:

  conf_j = exp(-|lbs_w_j - lbs_w_nn0|_1 / (2 * 0.1^2)) > 0.5     (gate)
  w_j    = exp(-d_j^2) * conf_j, normalized over K
  T_gau  = sum_j w_j * T_vert_j        (avatar/__init__.py:597-652)

and the canonical->posed chain removes/reapplies the blend shapes:
  T_a2pose = T_t2pose @ (inv(T_t2a) + [0 | canonical_offsets - curr_offsets])
  (avatar/__init__.py:444-450).

Gaussian means transform by T; rotations by R_T @ q; anisotropic scales stay
(rigid-per-gaussian approximation, as the reference)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.knn import knn_dist2
from ..ops.rotations import quat_multiply, rotmat_to_quat
from .smplx_jax import SMPLXParams, smplx_forward


def lbs_diffuse_transforms(lbs_weights, verts_transform, points,
                           template_points, K: int = 6,
                           weight_std: float = 0.1,
                           conf_threshold: float = 0.5):
    """Per-point blended transforms [N, 4, 4] (reference:
    avatar/__init__.py:597-652; note the reference weights by exp(-d^2) of
    the SQUARED knn distances)."""
    d2, idx = knn_dist2(points, template_points, k=K)
    nn_lbs = lbs_weights[idx]  # [N, K, J]
    conf = jnp.exp(
        -jnp.sum(jnp.abs(nn_lbs - nn_lbs[:, 0:1, :]), -1)
        / (2.0 * weight_std ** 2)
    )
    conf = (conf > conf_threshold).astype(jnp.float32)
    w = jnp.exp(-d2) * conf
    w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
    nn_T = verts_transform[idx]  # [N, K, 4, 4]
    return jnp.sum(w[..., None, None] * nn_T, axis=1)


class LBSDeformer:
    """Canonical (A-pose) gaussians -> target pose via LBS diffusion."""

    def __init__(self, params: SMPLXParams, canonical_body_pose=None):
        self.params = params
        # canonical forward (A-pose) provides T_t2a and the canonical offsets
        out_a = smplx_forward(params, body_pose=canonical_body_pose)
        self.a_verts = out_a.vertices
        self.T_t2a = out_a.vertex_transforms  # [V, 4, 4]
        self.inv_T_t2a = jnp.linalg.inv(out_a.vertex_transforms)
        self.canonical_offsets = out_a.shape_offsets + out_a.pose_offsets

    def point_transforms(self, body_pose, points, K: int = 6,
                         global_orient=None, betas=None, expression=None):
        """[N, 4, 4] canonical->posed transforms for gaussian centers."""
        out = smplx_forward(
            self.params, body_pose=body_pose, global_orient=global_orient,
            betas=betas, expression=expression,
        )
        curr_offsets = out.shape_offsets + out.pose_offsets
        T_a2t = self.inv_T_t2a.at[:, :3, 3].add(
            self.canonical_offsets - curr_offsets
        )
        T_a2pose = out.vertex_transforms @ T_a2t  # [V, 4, 4]
        return lbs_diffuse_transforms(
            self.params.lbs_weights, T_a2pose, points, self.a_verts, K=K
        )

    def deform_gaussians(self, gaussians, body_pose, K: int = 6, **kw):
        """Returns (xyz', rotation') for the active gaussians, rigid per
        gaussian under its blended transform (avatar/__init__.py:470-520)."""
        n = gaussians.xyz.shape[0]
        T = self.point_transforms(body_pose, gaussians.xyz, K=K, **kw)
        xyz_h = jnp.concatenate([gaussians.xyz, jnp.ones((n, 1))], -1)
        new_xyz = jnp.einsum("nab,nb->na", T, xyz_h)[:, :3]
        q_t = rotmat_to_quat(T[:, :3, :3])
        new_rot = quat_multiply(q_t, gaussians.rotation)
        return new_xyz, new_rot
