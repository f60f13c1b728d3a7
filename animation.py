"""Zero-shot avatar animation CLI — argument-compatible with the reference's
animation.py (reference: animation.py:590-648):

  python animation.py --ply logs/<id>/save/last.ply \
      --motion content/amass_test_17.npz --smplx_path pretrained/smplx \
      --play --rotate --save videos

Binds the trained splat avatar to the SMPL-X surface (TPU closest-point
query), re-poses it per AMASS frame, renders a rotating orbit, writes mp4 at
30 fps."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ply", type=str, required=True)
    parser.add_argument("--motion", type=str, required=True)
    parser.add_argument("--smplx_path", type=str, default="pretrained/smplx")
    parser.add_argument("--save", type=str, default="videos")
    parser.add_argument("--rotate", action="store_true")
    parser.add_argument("--play", action="store_true")
    parser.add_argument("--W", type=int, default=1024)
    parser.add_argument("--H", type=int, default=1024)
    parser.add_argument("--radius", type=float, default=2.5)
    parser.add_argument("--fovy", type=float, default=50)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--stub-body", action="store_true",
                        help="synthetic SMPL-X (no model files)")
    opt = parser.parse_args()

    import gaussianip_tpu as gt
    from gaussianip_tpu.human.animation import AvatarAnimator, load_animation_ply
    from gaussianip_tpu.human.smplx_jax import load_smplx_npz, make_test_model

    gs = load_animation_ply(opt.ply)
    gt.info(f"loaded {int(gs.n_active)} gaussians from {opt.ply}")

    if opt.stub_body or not (
        os.path.exists(opt.smplx_path)
        or os.path.exists(os.path.join(opt.smplx_path, "SMPLX_NEUTRAL.npz"))
    ):
        if not opt.stub_body:
            gt.warn(f"SMPL-X not found at {opt.smplx_path}; using synthetic body")
        params = make_test_model(np.random.default_rng(0), n_verts=2000,
                                 n_faces=3000)
    else:
        params = load_smplx_npz(opt.smplx_path)

    anim = AvatarAnimator(gs, params, motion_path=opt.motion)
    culled = anim.bind(0)
    gt.info(f"bound to mesh; culled {culled} gaussians (recon err > 0.01)")

    name = (os.path.splitext(os.path.basename(opt.ply))[0] + "_"
            + os.path.splitext(os.path.basename(opt.motion))[0])
    out = os.path.join(opt.save, f"{name}.mp4")
    anim.render_motion(out, play=opt.play, rotate=opt.rotate, height=opt.H,
                       width=opt.W, max_frames=opt.max_frames)
    gt.info(f"wrote {out}")


if __name__ == "__main__":
    main()
