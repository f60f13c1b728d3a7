"""Avatar quality-parity evaluation over a finished run directory.

The BASELINE target demands "LPIPS/ID-similarity parity" with the CUDA
reference; this is the harness that measures it (the reference's closest
tooling is gaussiansplatting/metrics.py:24-103 — PSNR/SSIM/LPIPS over render
directories — plus the insightface embedding it uses for conditioning,
ipa_guidance.py:236-248).

    python scripts/eval_avatar.py --run logs/<cur_time> \
        [--config configs/exp.yaml] [--face assets/audrey.png] \
        [--lpips-vgg path.pth --lpips-lin path.pth]

Computes, and writes to <run>/EVAL.json:
  * PSNR / SSIM / L1 of the final avatar's 32 refine-orbit renders against
    the stage-2 refined targets (same crop [60:890, 220:800] + x0.5 pipeline
    the stage-3 loss optimizes, reference: GaussianIP.py:424-436);
  * LPIPS with converted VGG weights when supplied (else skipped — a
    random-init LPIPS is not a metric);
  * ID-similarity: ArcFace cosine between the input face and the face
    detected in a frontal head-orbit render (insightface backend when
    installed; the deterministic fallback is REPORTED AS 'fallback' and its
    number is not comparable across backends).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def face_similarity(face_path: str, render_rgb: np.ndarray):
    """Cosine similarity between the ArcFace embeddings of the input face
    photo and a rendered frontal view. Returns (sim, backend)."""
    try:
        import cv2
        from insightface.app import FaceAnalysis

        app = FaceAnalysis(name="buffalo_l",
                           providers=["CPUExecutionProvider"])
        app.prepare(ctx_id=0, det_size=(640, 640))
        ref = app.get(cv2.imread(face_path))
        img = (np.clip(render_rgb, 0, 1) * 255).astype(np.uint8)[..., ::-1]
        got = app.get(img)
        if not ref or not got:
            return None, "insightface (no face detected)"
        a = ref[0].normed_embedding
        b = got[0].normed_embedding
        return float(np.dot(a, b)), "insightface"
    except ImportError:
        # deterministic stand-in so the harness runs end-to-end without
        # onnxruntime; NOT comparable to ArcFace numbers
        from gaussianip_tpu.system.pipeline import face_identity

        (e_ref, _), _ = face_identity(face_path, face_path)
        img = (np.clip(render_rgb, 0, 1) * 255).astype(np.uint8)
        from PIL import Image

        tmp = os.path.join("/tmp", "eval_avatar_render.png")
        Image.fromarray(img).save(tmp)
        (e_r, _), _ = face_identity(tmp, tmp)
        return float(np.dot(e_ref[0], e_r[0])), "fallback"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="run dir (logs/<cur_time>)")
    ap.add_argument("--config", default="configs/exp.yaml")
    ap.add_argument("--face", default=None,
                    help="input face photo (default: config "
                         "pil_image_faceid_path)")
    ap.add_argument("--lpips-vgg", default=None)
    ap.add_argument("--lpips-lin", default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); this box's "
                         "sitecustomize ignores JAX_PLATFORMS")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from gaussianip_tpu.data.cameras import camera_from_c2w
    from gaussianip_tpu.data.sampler import refine_orbit_batch
    from gaussianip_tpu.model.ply import state_from_ply
    from gaussianip_tpu.render.render import RenderConfig, render
    from gaussianip_tpu.system.refine import crop_and_downsample
    from gaussianip_tpu.utils.config import load_config
    from gaussianip_tpu.utils.metrics import l1, psnr, ssim

    cfg = load_config(args.config)
    sys_cfg = cfg["system"]

    manifest_path = os.path.join(args.run, "run.json")
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    ply = manifest.get("final_ply") or os.path.join(args.run, "save",
                                                    "last.ply")
    if not os.path.exists(ply):
        raise SystemExit(f"no final avatar at {ply}; run stage 3 first")
    refined_path = os.path.join(args.run, "after_refine.npz")
    if not os.path.exists(refined_path):
        raise SystemExit(f"no refined targets at {refined_path}")

    gs = state_from_ply(ply)
    refined = np.load(refined_path)["refined_rgbs_small"]  # [32, th, tw, 3]
    n_views = refined.shape[0]

    H = int(sys_cfg.get("ori_height", 1024))
    if refined.shape[1] * 2 < 512:  # smoke-scale run
        H = max(refined.shape[1] * 2, 32)
    orbit = refine_orbit_batch(
        n_views, float(sys_cfg["refine_elevation"]),
        float(sys_cfg["refine_camera_distance"]),
        float(sys_cfg["refine_fovy_deg"]), H, H)

    rcfg = RenderConfig()
    bs = 4
    rendered = []
    for i in range(0, n_views, bs):
        cams = jax.vmap(lambda m, f: camera_from_c2w(m, f, H, H))(
            orbit.c2w[i : i + bs], orbit.fovy[i : i + bs])
        rendered.append(np.asarray(
            render(gs, cams, jnp.zeros(3), rcfg).rgb))
    rendered = np.concatenate(rendered, axis=0)

    if H == 1024:
        small = np.asarray(crop_and_downsample(jnp.asarray(rendered)))
    else:
        # smoke scale: same pipeline, window scaled like launch.run_stage3
        cy = (60 * H // 1024, max(890 * H // 1024, 60 * H // 1024 + 8))
        cx = (220 * H // 1024, max(800 * H // 1024, 220 * H // 1024 + 8))
        crop = rendered[:, cy[0] : cy[1], cx[0] : cx[1], :]
        small = np.asarray(jax.image.resize(
            jnp.asarray(crop),
            (n_views, refined.shape[1], refined.shape[2], 3), "linear"))
    if small.shape != refined.shape:
        small = np.asarray(jax.image.resize(
            jnp.asarray(small), refined.shape, "linear"))

    x = jnp.asarray(small)
    y = jnp.asarray(refined)
    out = {
        "n_views": int(n_views),
        "render_size": int(H),
        "psnr": float(jnp.mean(jax.vmap(psnr)(x, y))),
        "ssim": float(jnp.mean(jax.vmap(lambda a, b: ssim(a, b))(x, y))),
        "l1": float(l1(x, y)),
        "ply": ply,
    }

    # LPIPS only with real converted weights
    if args.lpips_vgg and args.lpips_lin:
        from gaussianip_tpu.system.pipeline import load_lpips

        fn = load_lpips({"lpips_vgg_path": args.lpips_vgg,
                         "lpips_lin_path": args.lpips_lin})
        if fn is not None:
            ds = [float(np.mean(np.asarray(fn(x[i : i + 4], y[i : i + 4]))))
                  for i in range(0, n_views, 4)]
            out["lpips_vgg"] = float(np.mean(ds))
    else:
        out["lpips_vgg"] = None
        out["lpips_note"] = ("pass --lpips-vgg/--lpips-lin for the "
                             "perceptual metric")

    face = args.face or sys_cfg.get("guidance", {}).get(
        "pil_image_faceid_path")
    if face and os.path.exists(face):
        # frontal head-orbit view for the face crop (the eval orbit's head
        # half, reference: camera_data.py:519-590; azimuth 90 deg = front)
        from gaussianip_tpu.data.sampler import (CameraSamplerConfig,
                                                 eval_orbit_batch)

        ecfg = CameraSamplerConfig(
            eval_height=H, eval_width=H, n_val_views=4,
            eval_elevation_deg=float(cfg["data"]["eval_elevation_deg"]),
            eval_camera_distance=float(cfg["data"]["eval_camera_distance"]),
            eval_camera_distance_head=float(
                cfg["data"]["eval_camera_distance_head"]),
            eval_fovy_deg=float(cfg["data"]["eval_fovy_deg"]))
        eo = eval_orbit_batch(ecfg, "val")
        i_front = 4 + 3  # head-orbit half, azimuth +90 deg
        cams = jax.vmap(lambda m, f: camera_from_c2w(m, f, H, H))(
            eo.c2w[i_front : i_front + 1], eo.fovy[i_front : i_front + 1])
        frontal = np.asarray(render(gs, cams, jnp.zeros(3), rcfg).rgb[0])
        sim, backend = face_similarity(face, frontal)
        out["id_similarity"] = sim
        out["id_similarity_backend"] = backend
    else:
        out["id_similarity"] = None
        out["id_similarity_backend"] = "no face image configured"

    eval_path = os.path.join(args.run, "EVAL.json")
    with open(eval_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
