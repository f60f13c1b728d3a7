"""End-to-end exercise of the eval mechanics with stub weights (CPU).

Runs the tiny 3-stage pipeline (same overrides as the e2e launch test)
into a persistent run dir, then drives scripts/eval_avatar.py over it —
producing a real EVAL.json (PSNR/SSIM/L1 plumbing + ID-similarity via the
labeled fallback backend; LPIPS skipped without real VGG weights). The
resulting JSON is copied to repo root as EVAL_SMOKE.json so the artifact
is checked in, ready to re-run against real checkpoints when available.

Reference analog: gaussiansplatting/metrics.py:24-103 (PSNR/SSIM/LPIPS
over render dirs) + ipa_guidance.py:236-248 (ArcFace embedding).

    python scripts/eval_smoke.py [--keep RUNDIR]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep", default=None,
                    help="persistent run dir (default: temp dir, removed)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import launch
    from gaussianip_tpu.utils.config import load_config
    from gaussianip_tpu.utils.saving import RunDirs

    log_path = args.keep or tempfile.mkdtemp(prefix="eval_smoke_")
    # synthetic face photo for the (labeled) fallback identity path
    os.makedirs(os.path.join(log_path, "assets"), exist_ok=True)
    face_png = os.path.join(log_path, "assets", "face.png")
    from PIL import Image

    rng = np.random.default_rng(7)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        face_png)

    cfg = load_config(
        os.path.join(REPO, "configs", "exp.yaml"),
        "system.height=32", "system.width=32",
        "system.ori_height=32", "system.ori_width=32",
        "system.stub_image_size=32",
        "system.pts_num=256", "system.capacity=1024",
        "data.eval_height=32", "data.eval_width=32",
        "data.n_test_views=2",
        f"system.guidance.pil_image_faceid_path={face_png}",
        f"system.log_path={log_path}",
    )
    a = types.SimpleNamespace(stub_guidance=True, max_steps=2,
                              devices="1", train=True, resume_from=None)
    dirs = RunDirs(log_path, "smoke")
    dirs.manifest(config="exp.yaml", stage_requested="all", prompt="p")
    launch.run_stage1(cfg, dirs, a)
    launch.run_stage2(cfg, dirs, types.SimpleNamespace(**{**vars(a),
                                                          "max_steps": None}))
    launch.run_stage3(cfg, dirs, a)

    # eval_avatar needs the same tiny config; pass overrides via a temp yaml
    env = dict(os.environ)
    cmd = [sys.executable, os.path.join(REPO, "scripts", "eval_avatar.py"),
           "--run", dirs.root, "--platform", "cpu", "--face", face_png]
    # eval_avatar loads configs/exp.yaml for orbit params — fine at smoke
    # scale (its H auto-shrinks to the refined targets' size)
    r = subprocess.run(cmd, cwd=REPO, env=env)
    if r.returncode != 0:
        raise SystemExit(f"eval_avatar failed: {r.returncode}")
    src = os.path.join(dirs.root, "EVAL.json")
    with open(src) as f:
        out = json.load(f)
    out["note"] = ("stub-weights smoke run: exercises the eval mechanics "
                   "end-to-end; numbers are NOT quality parity (random "
                   "guidance, 2-step stages)")
    dst = os.path.join(REPO, "EVAL_SMOKE.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst)
    print(json.dumps(out, indent=1))
    if not args.keep:
        shutil.rmtree(log_path, ignore_errors=True)


if __name__ == "__main__":
    main()
