"""SMPL-X body model in pure JAX.

Replaces the external `smplx` / `custom_smplx` dependency (reference:
threestudio/utils/poser.py:489,600-608 and the per-vertex-transform superset
required by avatar/__init__.py:103-106,153-157,445-448). Standard SMPL-X
linear blend skinning:

  v_shaped = v_template + shapedirs @ betas + exprdirs @ expression
  J        = J_regressor @ v_shaped
  pose blend shapes from (R_local - I) of the 54 non-root joints
  rigid chain along parents -> world joint transforms A
  per-vertex transform T = lbs_weights @ A
  verts    = (T @ [v_shaped + pose_offsets, 1])[:3]

plus the extra vertex-picked keypoints (nose/eyes/ears/feet/finger tips)
appended after the 55 skeleton joints in the standard smplx package order, so
joint indices used by the reference's OpenPose mapping
(poser.py:545-566: indices 55-59 = nose/right-eye/left-eye/right-ear/left-ear)
line up exactly.

Model data loads from the official SMPLX_{GENDER}.npz files; everything is
jit-friendly (static shapes, no Python branches on data).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# standard smplx vertex ids (smplx package vertex_ids.py, 'smplx' entry)
SMPLX_VERTEX_IDS = {
    "nose": 9120, "reye": 9929, "leye": 9448, "rear": 616, "lear": 6,
    "rthumb": 8079, "rindex": 7669, "rmiddle": 7794, "rring": 7905,
    "rpinky": 8022, "lthumb": 5361, "lindex": 4933, "lmiddle": 5058,
    "lring": 5169, "lpinky": 5286, "LBigToe": 5770, "LSmallToe": 5780,
    "LHeel": 8846, "RBigToe": 8463, "RSmallToe": 8474, "RHeel": 8635,
}
# VertexJointSelector order: face, feet, hand tips (smplx package order)
EXTRA_JOINT_NAMES = (
    "nose", "reye", "leye", "rear", "lear",
    "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
    "lthumb", "lindex", "lmiddle", "lring", "lpinky",
    "rthumb", "rindex", "rmiddle", "rring", "rpinky",
)

NUM_JOINTS = 55  # 1 root + 21 body + jaw + 2 eyes + 2x15 hands
NUM_BODY_JOINTS = 21


class SMPLXParams(NamedTuple):
    v_template: jnp.ndarray  # [V, 3]
    shapedirs: jnp.ndarray  # [V, 3, n_betas]
    exprdirs: jnp.ndarray  # [V, 3, n_expr]
    posedirs: jnp.ndarray  # [54*9, V*3]
    j_regressor: jnp.ndarray  # [55, V]
    parents: np.ndarray  # [55] host ints
    lbs_weights: jnp.ndarray  # [V, 55]
    faces: np.ndarray  # [F, 3] host ints
    extra_joint_vids: np.ndarray  # [21] host ints


class SMPLXOutput(NamedTuple):
    vertices: jnp.ndarray  # [V, 3]
    joints: jnp.ndarray  # [55 + 21, 3]
    joint_transforms: jnp.ndarray  # [55, 4, 4] world transforms A
    vertex_transforms: jnp.ndarray  # [V, 4, 4] per-vertex T (superset API)
    shape_offsets: jnp.ndarray  # [V, 3]
    pose_offsets: jnp.ndarray  # [V, 3]
    v_shaped: jnp.ndarray  # [V, 3]


def load_smplx_npz(path: str, gender: str = "neutral", num_betas: int = 10,
                   num_expr: int = 10) -> SMPLXParams:
    """Load official SMPL-X npz (e.g. <path>/SMPLX_NEUTRAL.npz or a direct
    file path)."""
    if os.path.isdir(path):
        path = os.path.join(path, f"SMPLX_{gender.upper()}.npz")
    data = np.load(path, allow_pickle=True)
    shapedirs_all = np.asarray(data["shapedirs"], np.float32)  # [V,3,400]
    # smplx layout: first 300 shape, last 100 expression
    if shapedirs_all.shape[-1] >= 300 + num_expr:
        shape_d = shapedirs_all[..., :num_betas]
        expr_d = shapedirs_all[..., 300 : 300 + num_expr]
    else:
        shape_d = shapedirs_all[..., :num_betas]
        expr_d = np.zeros_like(shape_d[..., :num_expr])
    posedirs = np.asarray(data["posedirs"], np.float32)
    if posedirs.ndim == 3:  # [V, 3, 54*9] -> [54*9, V*3]
        posedirs = posedirs.reshape(posedirs.shape[0] * 3, -1).T
    nj = NUM_JOINTS
    return SMPLXParams(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(shape_d),
        exprdirs=jnp.asarray(expr_d),
        posedirs=jnp.asarray(posedirs[: (nj - 1) * 9]),
        j_regressor=jnp.asarray(np.asarray(data["J_regressor"], np.float32)[:nj]),
        parents=np.asarray(data["kintree_table"], np.int64)[0][:nj],
        lbs_weights=jnp.asarray(np.asarray(data["weights"], np.float32)[:, :nj]),
        faces=np.asarray(data["f"], np.int64),
        extra_joint_vids=np.array(
            [SMPLX_VERTEX_IDS[n] for n in EXTRA_JOINT_NAMES], np.int64
        ),
    )


def rodrigues(aa):
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3]."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    small = angle < 1e-8
    axis = aa / jnp.where(small, 1.0, angle)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    R = eye + s * K + (1 - c) * (K @ K)
    return jnp.where(small[..., None], eye, R)


def smplx_forward(
    params: SMPLXParams,
    betas: Optional[jnp.ndarray] = None,
    expression: Optional[jnp.ndarray] = None,
    body_pose: Optional[jnp.ndarray] = None,  # [21, 3] axis-angle
    global_orient: Optional[jnp.ndarray] = None,  # [3]
    jaw_pose: Optional[jnp.ndarray] = None,  # [3]
    left_hand_pose: Optional[jnp.ndarray] = None,  # [15, 3]
    right_hand_pose: Optional[jnp.ndarray] = None,  # [15, 3]
    transl: Optional[jnp.ndarray] = None,  # [3]
) -> SMPLXOutput:
    """Single-sample SMPL-X forward (vmap for batches). flat_hand_mean
    semantics: zero hand pose == flat hands (reference: poser.py:607)."""
    V = params.v_template.shape[0]
    nb = params.shapedirs.shape[-1]
    ne = params.exprdirs.shape[-1]
    betas = jnp.zeros((nb,)) if betas is None else betas
    expression = jnp.zeros((ne,)) if expression is None else expression
    body_pose = jnp.zeros((NUM_BODY_JOINTS, 3)) if body_pose is None else body_pose
    global_orient = jnp.zeros((3,)) if global_orient is None else global_orient
    jaw_pose = jnp.zeros((3,)) if jaw_pose is None else jaw_pose
    eye_pose = jnp.zeros((2, 3))
    left_hand_pose = (
        jnp.zeros((15, 3)) if left_hand_pose is None else left_hand_pose
    )
    right_hand_pose = (
        jnp.zeros((15, 3)) if right_hand_pose is None else right_hand_pose
    )

    shape_offsets = jnp.einsum("vcb,b->vc", params.shapedirs, betas) + jnp.einsum(
        "vcb,b->vc", params.exprdirs, expression
    )
    v_shaped = params.v_template + shape_offsets
    joints = params.j_regressor @ v_shaped  # [55, 3]

    full_pose = jnp.concatenate(
        [
            global_orient[None],
            body_pose,
            jaw_pose[None],
            eye_pose,
            left_hand_pose,
            right_hand_pose,
        ],
        axis=0,
    )  # [55, 3]
    R = rodrigues(full_pose)  # [55, 3, 3]

    pose_feature = (R[1:] - jnp.eye(3)).reshape(-1)  # [54*9]
    pose_offsets = (pose_feature @ params.posedirs).reshape(V, 3)

    # rigid chain (host-unrolled over the static 55-joint kintree)
    parents = params.parents
    rel = joints.at[1:].add(-joints[parents[1:]])
    transforms = [None] * NUM_JOINTS

    def make_t(Rj, tj):
        top = jnp.concatenate([Rj, tj[:, None]], axis=1)
        return jnp.concatenate(
            [top, jnp.array([[0.0, 0, 0, 1]], jnp.float32)], axis=0
        )

    transforms[0] = make_t(R[0], rel[0])
    for j in range(1, NUM_JOINTS):
        transforms[j] = transforms[parents[j]] @ make_t(R[j], rel[j])
    A = jnp.stack(transforms, axis=0)  # [55, 4, 4]

    # remove the rest-pose joint locations (relative skinning transforms)
    j_h = jnp.concatenate([joints, jnp.zeros((NUM_JOINTS, 1))], axis=1)
    A_rel = A.at[:, :3, 3].add(-jnp.einsum("jab,jb->ja", A, j_h)[:, :3])

    T = jnp.einsum("vj,jab->vab", params.lbs_weights, A_rel)  # [V, 4, 4]
    v_posed = v_shaped + pose_offsets
    v_h = jnp.concatenate([v_posed, jnp.ones((V, 1))], axis=1)
    verts = jnp.einsum("vab,vb->va", T, v_h)[:, :3]

    extra = verts[jnp.asarray(params.extra_joint_vids)]
    # posed skeleton joints: transform rest joints by A
    joints_posed = jnp.einsum("jab,jb->ja", A_rel, jnp.concatenate(
        [joints, jnp.ones((NUM_JOINTS, 1))], axis=1
    ))[:, :3]
    all_joints = jnp.concatenate([joints_posed, extra], axis=0)

    if transl is not None:
        verts = verts + transl
        all_joints = all_joints + transl

    return SMPLXOutput(
        vertices=verts,
        joints=all_joints,
        joint_transforms=A_rel,
        vertex_transforms=T,
        shape_offsets=shape_offsets,
        pose_offsets=pose_offsets,
        v_shaped=v_shaped,
    )


def make_test_model(rng: np.random.Generator, n_verts: int = 200,
                    n_faces: int = 64) -> SMPLXParams:
    """Synthetic mini-model with the exact SMPL-X structure (tests only —
    the real SMPLX_*.npz is a licensed download)."""
    v = rng.normal(0, 0.3, (n_verts, 3)).astype(np.float32)
    parents = np.zeros(NUM_JOINTS, np.int64)
    parents[1:] = rng.integers(0, np.arange(1, NUM_JOINTS))
    jr = rng.uniform(0, 1, (NUM_JOINTS, n_verts)).astype(np.float32)
    jr /= jr.sum(1, keepdims=True)
    w = rng.uniform(0, 1, (n_verts, NUM_JOINTS)).astype(np.float32) ** 4
    w /= w.sum(1, keepdims=True)
    vids = rng.integers(0, n_verts, len(EXTRA_JOINT_NAMES))
    return SMPLXParams(
        v_template=jnp.asarray(v),
        shapedirs=jnp.asarray(rng.normal(0, 0.01, (n_verts, 3, 10)).astype(np.float32)),
        exprdirs=jnp.asarray(rng.normal(0, 0.001, (n_verts, 3, 10)).astype(np.float32)),
        posedirs=jnp.asarray(
            rng.normal(0, 0.001, (54 * 9, n_verts * 3)).astype(np.float32)
        ),
        j_regressor=jnp.asarray(jr),
        parents=parents,
        lbs_weights=jnp.asarray(w),
        faces=rng.integers(0, n_verts, (n_faces, 3)),
        extra_joint_vids=vids,
    )
