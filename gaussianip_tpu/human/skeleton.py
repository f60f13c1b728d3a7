"""Skeleton: SMPL-X-driven OpenPose keypoints + body mesh for avatar init.

Behavioral rebuild of the reference's Skeleton (reference:
threestudio/utils/poser.py:591-821 — the *active* class, unified with the
older API the shipped system actually calls, see SURVEY.md "known
inconsistencies" #1): A-pose SMPL-X forward, SMPL-X joints -> OpenPose-18
mapping, rescale-to-0.6-extent + recenter, OpenGL->Blender y/z swap, scale(-10)
(= x1.1^10), surface point sampling, torso bbox / hand centers.

The pose-map *drawing* lives in posemap.py (pure JAX, jittable — the reference
round-trips through cv2 on host every camera, poser.py:832-904).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .smplx_jax import SMPLXParams, load_smplx_npz, make_test_model, smplx_forward

# SMPL-X joints (55 skeleton + extras) -> OpenPose-18, 0-based
# (reference: poser.py:545-566)
OPENPOSE18_FROM_SMPLX = np.array(
    [55, 12, 17, 19, 21, 16, 18, 20, 2, 5, 8, 1, 4, 7, 56, 57, 58, 59],
    np.int64,
)
OPENPOSE18_NAMES = (
    "nose", "neck", "right_shoulder", "right_elbow", "right_wrist",
    "left_shoulder", "left_elbow", "left_wrist", "right_hip", "right_knee",
    "right_ankle", "left_hip", "left_knee", "left_ankle", "right_eye",
    "left_eye", "right_ear", "left_ear",
)
# limb segments (reference: poser.py:688)
OPENPOSE18_LINES = np.array(
    [[0, 1], [1, 2], [2, 3], [3, 4], [1, 5], [5, 6], [6, 7], [1, 8], [8, 9],
     [9, 10], [1, 11], [11, 12], [12, 13], [0, 14], [14, 16], [0, 15], [15, 17]],
    np.int64,
)
# controlnet_aux keypoint colors (reference: poser.py:701-703)
OPENPOSE18_COLORS = np.array(
    [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
     [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
     [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
     [255, 0, 255], [255, 0, 170], [255, 0, 85]],
    np.float32,
)


def apose_body_pose() -> np.ndarray:
    """The reference's A-pose (reference: poser.py:776-784). [21, 3]."""
    bp = np.zeros((21, 3), np.float32)
    bp[0, 1] = 0.2
    bp[0, 2] = 0.1
    bp[1, 1] = -0.2
    bp[1, 2] = -0.1
    bp[15, 2] = -math.pi / 4
    bp[16, 2] = math.pi / 4
    bp[19, 0] = 1.0
    bp[20, 0] = 1.0
    return bp


class Skeleton:
    """Host-side container: holds the SMPL-X params and the current
    (rescaled, y/z-swapped) vertices/keypoints as numpy arrays."""

    def __init__(self, smplx_path=None, gender="neutral", style="openpose",
                 apose=True, _test_model: SMPLXParams | None = None):
        self.style = style
        self.apose = apose
        if _test_model is not None:
            self.params = _test_model
        else:
            self.params = load_smplx_npz(smplx_path, gender)
        self.vertices = None  # [V, 3] numpy
        self.faces = np.asarray(self.params.faces)
        self.points3d = None  # [18, 3] numpy (blender coords)
        self.ori_center = None
        self.ori_scale = None

    def forward_smplx(self, betas=None, expression=None, body_pose=None):
        if body_pose is None:
            body_pose = np.zeros((21, 3), np.float32)
        if self.apose:
            ap = apose_body_pose()
            body_pose = np.where(ap != 0, ap, body_pose).astype(np.float32)

        out = smplx_forward(
            self.params,
            betas=None if betas is None else jnp.asarray(betas),
            expression=None if expression is None else jnp.asarray(expression),
            body_pose=jnp.asarray(body_pose),
        )
        verts = np.asarray(out.vertices)
        joints = np.asarray(out.joints)[OPENPOSE18_FROM_SMPLX]

        # rescale to 0.6 max extent + recenter (reference: poser.py:804-810)
        vmin, vmax = verts.min(0), verts.max(0)
        self.ori_center = (vmax + vmin) / 2
        self.ori_scale = 0.6 / np.max(vmax - vmin)
        verts = (verts - self.ori_center) * self.ori_scale
        joints = (joints - self.ori_center) * self.ori_scale

        # opengl -> blender (swap y/z), reference: poser.py:812-814
        verts[:, [1, 2]] = verts[:, [2, 1]]
        joints[:, [1, 2]] = joints[:, [2, 1]]
        self.vertices = verts
        self.points3d = joints
        return out

    # legacy-API alias (the shipped system calls load_smplx after a path-less
    # constructor; we take the path in __init__ and expose this for parity)
    def load_smplx(self, *_args, **_kw):
        return self.forward_smplx()

    def scale(self, delta):
        """reference: poser.py:818-821 (scale(-10) => x1.1^10 ~ 2.594)."""
        f = 1.1 ** (-delta)
        self.points3d = self.points3d * f
        if self.vertices is not None:
            self.vertices = self.vertices * f

    @property
    def hand_centers(self):
        il = OPENPOSE18_NAMES.index("left_wrist")
        ir = OPENPOSE18_NAMES.index("right_wrist")
        return self.points3d[[il, ir]]

    @property
    def center(self):
        return self.points3d.mean(0)

    @property
    def torso_bbox(self):
        """reference: poser.py:724-733."""
        pts = self.points3d
        mn = pts.min(0) - 0.1
        mx = pts.max(0) + 0.1
        remedy = np.maximum(0, 0.8 - (mx - mn)) / 2
        return mn - remedy, mx + remedy

    def sample_smplx_points(self, N=20000, seed=0):
        """Area-weighted surface sampling (replaces trimesh.sample_surface,
        reference: poser.py:735-741)."""
        assert self.vertices is not None, "call forward_smplx first"
        rng = np.random.default_rng(seed)
        v = self.vertices
        f = self.faces
        e1 = v[f[:, 1]] - v[f[:, 0]]
        e2 = v[f[:, 2]] - v[f[:, 0]]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
        p = area / area.sum()
        fi = rng.choice(len(f), size=N, p=p)
        r1 = np.sqrt(rng.uniform(size=(N, 1)))
        r2 = rng.uniform(size=(N, 1))
        a = 1 - r1
        b = r1 * (1 - r2)
        c = r1 * r2
        pts = a * v[f[fi, 0]] + b * v[f[fi, 1]] + c * v[f[fi, 2]]
        return pts.astype(np.float32)
