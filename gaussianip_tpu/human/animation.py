"""Zero-shot avatar animation: bind a trained .ply to the SMPL-X surface and
re-pose it from AMASS motion capture.

Behavioral rebuild of the reference's animation path (reference:
animation.py:66-648 + gs_renderer.py:525-610):

  * .ply loaded with the animation coordinate shim (xyz/scaling y/z swap,
    quaternion components [2,3] swapped and w negated —
    gs_renderer.py:576-581);
  * per-frame SMPL-X forward with body_pose = motion['poses'][frame, 1:22]
    and flat hands (animation.py:276-303); rescale/recenter constants cached
    from the FIRST frame (animation.py:320-325), then scale(-10);
  * first frame: bind each gaussian to its closest mesh triangle
    (signed distance + face + barycentric uvw — TPU closest-point query in
    ops/triangle.py replaces the cubvh BVH); gaussians whose reconstruction
    error exceeds 0.01 are culled (~0.5%, animation.py:352-372);
  * later frames: xyz = bary(v0, v1, v2; uvw) + dist * face_normal
    (animation.py:374-388);
  * orbit render at radius 2.5 / fovy 50 / 1024^2, one frame per degree,
    mp4 at 30 fps (animation.py:617-645).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import camera_from_c2w
from ..model import ply as ply_io
from ..ops.camera_math import look_at_c2w
from ..ops.triangle import signed_distance_to_mesh
from ..render.render import RenderConfig, render
from .smplx_jax import SMPLXParams, smplx_forward


def load_animation_ply(path, capacity=None):
    """Load a trained avatar .ply with the animation coordinate shim."""
    d = ply_io.load_ply(path)
    xyz = d["xyz"].copy()
    xyz[:, [1, 2]] = xyz[:, [2, 1]]
    sc = d["scaling"].copy()
    sc[:, [1, 2]] = sc[:, [2, 1]]
    rots = d["rotation"].copy()
    rots[:, [2, 3]] = rots[:, [3, 2]]
    rots[:, 0] *= -1
    d["xyz"], d["scaling"], d["rotation"] = xyz, sc, rots

    from ..model.gaussians import empty_state, pad_to_capacity

    n = xyz.shape[0]
    if capacity is None:
        capacity = max(4096, -(-n // 4096) * 4096)
    n_rest = d["f_rest"].shape[1]
    deg = int(round((n_rest + 1) ** 0.5)) - 1
    st = empty_state(capacity, deg)
    st = pad_to_capacity(st, {k: jnp.asarray(v) for k, v in d.items()}, n)
    return st.replace(active_sh_degree=deg)


class AvatarAnimator:
    def __init__(self, gaussians, smplx_params: SMPLXParams, motion_path=None,
                 motion_poses=None):
        """gaussians: GaussianState (animation coords); motion: AMASS npz
        with poses [T, 55, 3] (body pose = joints 1..21)."""
        self.gaussians = gaussians
        self.params = smplx_params
        if motion_poses is None:
            motion_poses = np.load(motion_path)["poses"]
        mp = np.asarray(motion_poses, np.float32)
        if mp.ndim == 2:
            # raw AMASS layout [T, J*3] (SMPL-X: 165): unflatten to [T, J, 3]
            # (the reference's bundled motions are pre-reshaped [T, 55, 3],
            # reference animation.py:216; accept both)
            assert mp.shape[1] % 3 == 0, f"bad pose dim {mp.shape}"
            mp = mp.reshape(mp.shape[0], -1, 3)
        self.motion = mp[:, 1:22]
        self.ori_center = None
        self.ori_scale = None
        self.mapping = None  # (dist, face, uvw) after bind

    @property
    def n_frames(self):
        return len(self.motion)

    def _mesh_at(self, frame: int):
        out = smplx_forward(
            self.params, body_pose=jnp.asarray(self.motion[frame])
        )
        verts = np.asarray(out.vertices)
        if self.ori_center is None:
            vmin, vmax = verts.min(0), verts.max(0)
            self.ori_center = (vmax + vmin) / 2
            self.ori_scale = 0.6 / np.max(vmax - vmin)
        verts = (verts - self.ori_center) * self.ori_scale
        verts = verts * (1.1 ** 10)  # scale(-10), animation.py:328
        return jnp.asarray(verts)

    def bind(self, frame: int = 0, err_threshold: float = 0.01,
             face_block: int = 1024):
        """First-frame binding + error culling (animation.py:330-372)."""
        verts = self._mesh_at(frame)
        faces = jnp.asarray(self.params.faces.astype(np.int32))
        n = int(self.gaussians.n_active)
        pts = self.gaussians.xyz[:n]
        dist, face, uvw = signed_distance_to_mesh(pts, verts, faces,
                                                  face_block=face_block)
        # reconstruction check
        fa = faces[face]
        v0, v1, v2 = verts[fa[:, 0]], verts[fa[:, 1]], verts[fa[:, 2]]
        nrm = jnp.cross(v1 - v0, v2 - v0)
        nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-20)
        rec = (uvw[:, 0:1] * v0 + uvw[:, 1:2] * v1 + uvw[:, 2:3] * v2
               + dist[:, None] * nrm)
        err = jnp.linalg.norm(rec - pts, axis=-1)
        keep = np.asarray(err <= err_threshold)

        # cull erroneous gaussians (host-side; binding happens once)
        idx = np.nonzero(keep)[0]
        from ..model.gaussians import empty_state, pad_to_capacity

        g = self.gaussians
        st = empty_state(g.capacity, g.max_sh_degree)
        st = pad_to_capacity(
            st,
            {f: np.asarray(getattr(g, f)[:n])[idx]
             for f in ("xyz", "f_dc", "f_rest", "scaling", "rotation",
                       "opacity")},
            len(idx),
        )
        self.gaussians = st.replace(active_sh_degree=g.active_sh_degree)
        self.mapping = (
            jnp.asarray(np.asarray(dist)[idx]),
            jnp.asarray(np.asarray(face)[idx]),
            jnp.asarray(np.asarray(uvw)[idx]),
        )
        return int(n - len(idx))  # culled count

    def repose(self, frame: int):
        """Move gaussians to the posed surface (animation.py:374-388)."""
        assert self.mapping is not None, "bind() first"
        verts = self._mesh_at(frame)
        faces = jnp.asarray(self.params.faces.astype(np.int32))
        dist, face, uvw = self.mapping
        fa = faces[face]
        v0, v1, v2 = verts[fa[:, 0]], verts[fa[:, 1]], verts[fa[:, 2]]
        nrm = jnp.cross(v1 - v0, v2 - v0)
        nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-20)
        pts = (uvw[:, 0:1] * v0 + uvw[:, 1:2] * v1 + uvw[:, 2:3] * v2
               + dist[:, None] * nrm)
        n = pts.shape[0]
        self.gaussians = self.gaussians.replace(
            xyz=self.gaussians.xyz.at[:n].set(pts)
        )

    def render_frame(self, azimuth_deg: float, elevation_deg: float = 0.0,
                     radius: float = 2.5, fovy_deg: float = 50.0,
                     height: int = 1024, width: int = 1024,
                     render_cfg: Optional[RenderConfig] = None):
        """One orbit frame; the animation world is y-up (no blender swap,
        animation.py load_smplx skips it)."""
        el = np.deg2rad(elevation_deg)
        az = np.deg2rad(azimuth_deg)
        center = np.asarray(self.gaussians.xyz[: int(self.gaussians.n_active)]
                            ).mean(0)
        eye = center + radius * np.array(
            [np.cos(el) * np.sin(az), np.sin(el), np.cos(el) * np.cos(az)])
        c2w = look_at_c2w(jnp.asarray(eye, jnp.float32)[None],
                          jnp.asarray(center, jnp.float32)[None],
                          jnp.array([[0.0, 1.0, 0.0]]))
        cams = jax.vmap(
            lambda m: camera_from_c2w(m, jnp.float32(np.deg2rad(fovy_deg)),
                                      height, width))(c2w)
        cfg = render_cfg or RenderConfig()
        out = render(self.gaussians, cams, jnp.zeros(3), cfg)
        return np.asarray(out.rgb[0]).clip(0, 1)

    def render_motion(self, save_path: str, play: bool = True,
                      rotate: bool = True, height: int = 1024,
                      width: int = 1024, fps: int = 30,
                      max_frames: Optional[int] = None,
                      render_cfg: Optional[RenderConfig] = None,
                      log_every: int = 30):
        """Full playback -> mp4 (or .npy fallback without ffmpeg)."""
        if self.mapping is None:
            self.bind(0)
        azimuths = np.arange(0, 360, 1)
        total = min(self.n_frames, len(azimuths))
        if max_frames:
            total = min(total, max_frames)
        frames = []
        for i in range(total):
            if play:
                self.repose(i % self.n_frames)
            az = azimuths[i % len(azimuths)] if rotate else 0.0
            img = self.render_frame(az, height=height, width=width,
                                    render_cfg=render_cfg)
            frames.append((img * 255).astype(np.uint8))
        video = np.stack(frames)
        from ..utils.saving import save_video

        # cv2 VideoWriter first (works in ffmpeg-less envs), then imageio,
        # then .npy
        save_video(save_path, video, fps=fps)
        return video
