"""Dump the optimized HLO of the splat fwd+bwd and summarize the named
fusions that show up hot in the device trace (profile_splat.py)."""
import os
import re
import sys

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
batch = 1
pts = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
d2 = mean_dist2_3nn(jnp.asarray(pts), block=4096)
state = create_from_pcd(pts, cols, n, d2)

az = jnp.linspace(0, 2 * jnp.pi, batch, endpoint=False)
eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                 jnp.full((batch,), 0.2)], -1)
c2w = look_at_c2w(eye, jnp.zeros((batch, 3)),
                  jnp.tile(jnp.array([[0.0, 0, 1]]), (batch, 1)))
cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
bg = jnp.zeros(3)
cfg = RenderConfig(backend="pallas")
K = 3


def loss(st, off):
    out = render(st, cams, bg, cfg, mean2d_offset=off)
    return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)


@jax.jit
def fb_k(state):
    carry = jnp.float32(0.0)
    off = jnp.zeros((batch, n, 2))
    for _ in range(K):
        st = state.replace(xyz=state.xyz + carry * 1e-12)
        g = jax.grad(loss, argnums=(0, 1), allow_int=True)(st, off)
        carry = jnp.sum(g[1]) + jnp.sum(g[0].xyz)
    return carry


txt = fb_k.lower(state).compile().as_text()
with open("/tmp/splat_hlo.txt", "w") as f:
    f.write(txt)
print("bytes:", len(txt))

# summarize each requested fusion: root op + shapes of its params/root
want = sys.argv[1:] or ["fusion.11", "fusion.23", "fusion.18",
                        "slice_reduce_fusion.2", "fusion.28", "fusion.613",
                        "fusion.16", "fusion.9", "fusion.14"]
for name in want:
    m = re.search(rf"^\s*%?{re.escape(name)} = .*$", txt, re.M)
    if m:
        print("\n====", m.group(0)[:400])
