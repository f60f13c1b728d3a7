"""Artifact saving: images, grids, image sequences -> mp4.

Functional subset of the reference's SaverMixin (reference:
threestudio/utils/saving.py:128-654) covering everything the active pipeline
writes: per-view pngs, validation renders, the test-orbit mp4 at 30 fps
(GaussianIP.py:539-547), and run manifests."""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import numpy as np


def _to_uint8(img) -> np.ndarray:
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)
    return a


def save_image(path: str, img):
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(_to_uint8(img)).save(path)
    return path


def save_image_grid(path: str, imgs, cols: Optional[int] = None):
    imgs = [_to_uint8(i) for i in imgs]
    n = len(imgs)
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = -(-n // cols)
    h, w = imgs[0].shape[:2]
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    return save_image(path, grid)


def save_video(path: str, frames, fps: int = 30):
    """Playable mp4 (the reference's animation deliverable,
    reference: animation.py:643-645). Encoder order: OpenCV VideoWriter
    (mp4v, no ffmpeg needed) -> imageio (ffmpeg backend) -> .npy stack."""
    video = np.stack([_to_uint8(f) for f in frames])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        import cv2

        h, w = video.shape[1:3]
        wr = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not wr.isOpened():
            raise RuntimeError("VideoWriter failed to open")
        for f in video:
            wr.write(f[..., ::-1])  # RGB -> BGR
        wr.release()
        if os.path.getsize(path) > 0:
            return path
        raise RuntimeError("empty mp4")
    except Exception:
        pass
    try:
        import imageio

        imageio.mimwrite(path, video, fps=fps)
        return path
    except Exception:
        alt = path + ".npy"
        np.save(alt, video)
        return alt


def save_img_sequence_as_video(out_path: str, img_dir: str,
                               pattern: str = r"(\d+)\.png", fps: int = 30):
    """Collect numbered frames from a directory -> mp4 (reference:
    SaverMixin.save_img_sequence, GaussianIP.py:539-547)."""
    from PIL import Image

    rx = re.compile(pattern)
    entries = []
    for f in os.listdir(img_dir):
        m = rx.fullmatch(f)
        if m:
            entries.append((int(m.group(1)), f))
    entries.sort()
    frames = [np.asarray(Image.open(os.path.join(img_dir, f)))[..., :3]
              for _, f in entries]
    return save_video(out_path, frames, fps)


def save_json(path: str, obj):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=str)
    return path


class RunDirs:
    """Per-run directory layout (replaces the reference's trial-dir +
    log.txt pointer + config-file mutation, SURVEY.md §5: explicit per-run
    stage state instead of racy shared-config rewrites)."""

    def __init__(self, log_path: str, run_id: str):
        self.root = os.path.join(log_path, run_id)
        self.save = os.path.join(self.root, "save")
        os.makedirs(self.save, exist_ok=True)

    def path(self, *parts):
        p = os.path.join(self.root, *parts)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    def manifest(self, **updates):
        """Read-modify-write the run manifest (stage progress lives here)."""
        mp = os.path.join(self.root, "run.json")
        data = {}
        if os.path.exists(mp):
            with open(mp) as f:
                data = json.load(f)
        data.update(updates)
        save_json(mp, data)
        return data

    def manifest_get(self, key, default=None):
        """Read one key from the run manifest (None/default if absent)."""
        mp = os.path.join(self.root, "run.json")
        if not os.path.exists(mp):
            return default
        with open(mp) as f:
            return json.load(f).get(key, default)

    def snapshot_code(self, repo_dir: Optional[str] = None):
        """Record the exact code state that produced this run (the
        reference's CodeSnapshotCallback, threestudio/utils/callbacks.py:
        60-94, snapshots the git worktree): git commit + a patch of any
        uncommitted changes, written under <run>/code/. Degrades to a no-op
        outside a git checkout."""
        import subprocess

        repo = repo_dir or os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        out_dir = os.path.join(self.root, "code")

        def git(*args):
            return subprocess.run(
                ["git", "-C", repo, *args], capture_output=True, text=True,
                timeout=30)

        try:
            head = git("rev-parse", "HEAD")
            if head.returncode != 0:
                return None
            os.makedirs(out_dir, exist_ok=True)
            commit = head.stdout.strip()
            with open(os.path.join(out_dir, "COMMIT"), "w") as f:
                f.write(commit + "\n")
            diff = git("diff", "HEAD")
            if diff.stdout:
                with open(os.path.join(out_dir, "uncommitted.patch"),
                          "w") as f:
                    f.write(diff.stdout)
            # untracked files are part of the code state too (the reference
            # callback snapshots them; a run driven by a new module would
            # otherwise be recorded as clean at HEAD)
            untracked = git("ls-files", "--others", "--exclude-standard")
            ut_names = [u for u in untracked.stdout.splitlines() if u]
            if ut_names:
                with open(os.path.join(out_dir, "UNTRACKED"), "w") as f:
                    f.write("\n".join(ut_names) + "\n")
            dirty = bool(diff.stdout.strip()) or bool(ut_names)
            self.manifest(code_commit=commit, code_dirty=dirty)
            return commit
        except Exception:
            return None
