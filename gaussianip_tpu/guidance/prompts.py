"""View-dependent prompt processing.

Behavioral rebuild of the reference's prompt processor (reference:
threestudio/models/prompt_processors/base.py:30-81, 253-335 — the FaceID
13-direction table with `full body photo` variants and the overhead rule,
including the order-dependent overwrite semantics of the direction index) and
the (pos, neg, null) stacked embedding output consumed by the ANPG guidance
(ipa_guidance.py:376-388).

The text encoder is pluggable: the real path wraps the SD checkpoint's CLIP
text encoder via transformers-Flax (system/pipeline.load_text_encoder);
tests use a deterministic fake. Embeddings
are cached on disk keyed by md5(model_name + prompt) like the reference
(base.py:18-21) — but computed in-process (no spawned subprocess: TPU-host
RAM is not the constraint the reference's VRAM was, SURVEY.md §2.4).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Callable, List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# (name, prompt_template, condition) in reference order; conditions use
# (elevation, azimuth, center_z, all_vis, distance) and later entries
# overwrite earlier ones (reference: base.py:64-70)
def _faceid_directions(head_offset: float):
    t = lambda suffix: (lambda s: f"{s}, {suffix}")
    return [
        ("left front", t("left front view"),
         lambda e, a, c, v, d: (v == 0) & (a > 0) & (a < 45)),
        ("left back", t("left back view"),
         lambda e, a, c, v, d: (v == 0) & (a > -45) & (a < 0)),
        ("right front", t("right front view"),
         lambda e, a, c, v, d: (v == 0) & (a > 135)),
        ("right back", t("right back view"),
         lambda e, a, c, v, d: (v == 0) & (a < -135)),
        ("front", t("front view"),
         lambda e, a, c, v, d: (v == 0) & (a > 45) & (a < 135)),
        ("back", t("back view"),
         lambda e, a, c, v, d: (v == 0) & (a > -135) & (a < -45)),
        ("left front fb", t("full body photo, left front view"),
         lambda e, a, c, v, d: (v == 1) & (a > 0) & (a < 45)),
        ("left back fb", t("full body photo, left back view"),
         lambda e, a, c, v, d: (v == 1) & (a > -45) & (a < 0)),
        ("right front fb", t("full body photo, right front view"),
         lambda e, a, c, v, d: (v == 1) & (a > 135)),
        ("right back fb", t("full body photo, right back view"),
         lambda e, a, c, v, d: (v == 1) & (a < -135)),
        ("front fb", t("full body photo, front view"),
         lambda e, a, c, v, d: (v == 1) & (a > 45) & (a < 135)),
        ("back fb", t("full body photo, back view"),
         lambda e, a, c, v, d: (v == 1) & (a > -135) & (a < -45)),
        ("overhead", t("overhead view"),
         lambda e, a, c, v, d: (c == head_offset) & (a > 0)),
    ]


def direction_index(elevation, azimuth, center_z, all_vis, camera_distances,
                    head_offset: float = 0.65):
    """[B] int32 direction index with the reference's overwrite-in-order
    semantics (default 0 when nothing matches)."""
    idx = jnp.zeros_like(azimuth, dtype=jnp.int32)
    for i, (_, _, cond) in enumerate(_faceid_directions(head_offset)):
        m = cond(elevation, azimuth, center_z, all_vis, camera_distances)
        idx = jnp.where(m, i, idx)
    return idx


class PromptEmbeddings(NamedTuple):
    text_vd: jnp.ndarray  # [13, S, D] view-dependent positive embeddings
    uncond_vd: jnp.ndarray  # [13, S, D] negative embeddings
    null: jnp.ndarray  # [S, D]
    text: jnp.ndarray  # [S, D] plain positive (non-view-dependent)

    def get_text_embeddings(self, elevation, azimuth, center_z, all_vis,
                            camera_distances, view_dependent: bool = True,
                            head_offset: float = 0.65):
        """-> [3B, S, D] stacked (pos, neg, null) — the reference's order
        (base.py:80-81)."""
        b = elevation.shape[0]
        if view_dependent:
            idx = direction_index(elevation, azimuth, center_z, all_vis,
                                  camera_distances, head_offset)
            pos = self.text_vd[idx]
            neg = self.uncond_vd[idx]
        else:
            pos = jnp.broadcast_to(self.text[None], (b,) + self.text.shape)
            neg = jnp.broadcast_to(self.uncond_vd[0][None],
                                   (b,) + self.text.shape)
        null = jnp.broadcast_to(self.null[None], (b,) + self.null.shape)
        return jnp.concatenate([pos, neg, null], axis=0)


def _hash(model_name: str, prompt: str) -> str:
    return hashlib.md5(f"[{model_name}] {prompt}".encode()).hexdigest()


def make_prompt_embeddings(
    encode_fn: Callable[[List[str]], np.ndarray],
    prompt: str,
    negative_prompt: str,
    null_prompt: str = "",
    head_offset: float = 0.65,
    cache_dir: Optional[str] = None,
    model_name: str = "",
) -> PromptEmbeddings:
    """encode_fn: list of prompts -> [N, S, D] float array (CLIP final hidden
    states). Disk-cached per prompt when cache_dir given."""
    dirs = _faceid_directions(head_offset)
    prompts_vd = [tmpl(prompt) for _, tmpl, _ in dirs]
    neg_vd = [negative_prompt] * len(dirs)
    all_prompts = prompts_vd + neg_vd + [null_prompt, prompt]

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        missing = []
        for p in all_prompts:
            fp = os.path.join(cache_dir, _hash(model_name, p) + ".npy")
            if not os.path.exists(fp):
                missing.append(p)
        missing = sorted(set(missing))
        if missing:
            embs = np.asarray(encode_fn(missing))
            for p, e in zip(missing, embs):
                np.save(os.path.join(cache_dir, _hash(model_name, p) + ".npy"), e)
        out = np.stack(
            [np.load(os.path.join(cache_dir, _hash(model_name, p) + ".npy"))
             for p in all_prompts]
        )
    else:
        out = np.asarray(encode_fn(all_prompts))

    nd = len(dirs)
    return PromptEmbeddings(
        text_vd=jnp.asarray(out[:nd]),
        uncond_vd=jnp.asarray(out[nd : 2 * nd]),
        null=jnp.asarray(out[2 * nd]),
        text=jnp.asarray(out[2 * nd + 1]),
    )


def fake_text_encoder(seq_len: int = 77, dim: int = 768):
    """Deterministic per-prompt pseudo-embeddings for tests/smoke runs."""

    def encode(prompts: List[str]) -> np.ndarray:
        out = []
        for p in prompts:
            seed = int(hashlib.md5(p.encode()).hexdigest()[:8], 16)
            r = np.random.default_rng(seed)
            out.append(r.normal(0, 0.02, (seq_len, dim)).astype(np.float32))
        return np.stack(out)

    return encode


# classic 4-direction table (view_dependent_prompt_front mode, used by the
# non-FaceID path; reference: base.py:223-251)
def _classic_directions(head_offset: float):
    return [
        ("side", lambda s: f"side view of {s}",
         lambda e, a, c, v, d: ((a > -45) & (a < 60)) | (a < -135) | (a > 120)),
        ("front", lambda s: f"front view of {s}",
         lambda e, a, c, v, d: (a > 60) & (a < 120)),
        ("back", lambda s: f"backside view of {s}",
         lambda e, a, c, v, d: (a > -135) & (a < -45)),
        ("overhead", lambda s: f"overhead view of {s}",
         lambda e, a, c, v, d: (c == head_offset) & (a > 0)),
    ]


def classic_direction_index(elevation, azimuth, center_z, camera_distances,
                            head_offset: float = 0.65):
    idx = jnp.zeros_like(azimuth, dtype=jnp.int32)
    for i, (_, _, cond) in enumerate(_classic_directions(head_offset)):
        m = cond(elevation, azimuth, center_z, None, camera_distances)
        idx = jnp.where(m, i, idx)
    return idx


def preprocess_prompt(prompt: str, library_path: str = "load/prompt_library.json",
                      section: str = "dreamfusion") -> str:
    """'lib:kw1_kw2' prompt-library lookup (reference: base.py:451-470):
    every keyword must appear; exactly one match required."""
    if not prompt.startswith("lib:"):
        return prompt
    import json

    with open(library_path) as f:
        library = json.load(f)
    keywords = prompt[4:].lower().split("_")
    candidate = None
    for p in library[section]:
        if all(k in p.lower() for k in keywords):
            if candidate is not None:
                raise ValueError(
                    f"multiple prompts match keywords {keywords} in library")
            candidate = p
    if candidate is None:
        raise ValueError(f"no prompt with keywords {keywords} in library")
    return candidate
