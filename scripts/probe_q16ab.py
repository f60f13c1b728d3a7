"""Image-level A/B of the q16 depth-key approximation (VERDICT r3 #8).

The production binning default `depth_key="q16"` quantizes within-tile depth
order to 65536 buckets (ties compose in sort-network order); "exact2" is the
CUDA rasterizer's exact within-tile depth order semantics
(reference consumption: gaussiansplatting/gaussian_renderer/__init__.py:85-93).

This renders the bench scene (100k capsule, random colors/opacities — a
HARSHER tie-compose case than a trained avatar, whose neighboring gaussians
have correlated colors) at 1024^2 from 4 orbit views with both keys and
reports PSNR / max|diff| between the images. Checked-in result: NOTES.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianip_tpu.data.cameras import camera_from_c2w
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.camera_math import look_at_c2w
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig, render

rng = np.random.default_rng(0)
n = 100_000
res = 1024
batch = 4
z = rng.uniform(-0.85, 0.85, n)
th = rng.uniform(0, 2 * np.pi, n)
r = 0.25 * np.sqrt(np.maximum(0.0, 1 - (z / 0.9) ** 2)) + 0.03
pts = np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)
pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
d2 = mean_dist2_3nn(jnp.asarray(pts), block=4096)
state = create_from_pcd(pts, cols, n, d2)
state = state.replace(
    opacity=jnp.asarray(rng.uniform(-1.0, 2.5, (n, 1)).astype(np.float32)))

az = jnp.linspace(0, 2 * jnp.pi, batch, endpoint=False)
eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                 jnp.full((batch,), 0.2)], -1)
c2w = look_at_c2w(eye, jnp.zeros((batch, 3)),
                  jnp.tile(jnp.array([[0.0, 0, 1]]), (batch, 1)))
cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
bg = jnp.zeros(3)

t0 = time.time()
imgs = {}
for key in ("exact2", "q16", "rank"):
    cfg = RenderConfig(backend="pallas", depth_key=key,
                       sort_stable=(key != "q16"))
    out = jax.jit(lambda st, c=cfg: render(st, cams, bg, c))(state)
    imgs[key] = np.asarray(out.rgb, np.float64)
    print(f"[{time.time()-t0:.0f}s] rendered {key}", flush=True)

ref = imgs["exact2"]
for key in ("q16", "rank"):
    d = imgs[key] - ref
    mse = float(np.mean(d * d))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-20))
    print(f"{key:6s} vs exact2: PSNR {psnr:6.2f} dB  max|diff| {np.max(np.abs(d)):.4f}  "
          f"pix>1/255: {float(np.mean(np.abs(d).max(-1) > 1/255)) * 100:.4f}%",
          flush=True)
