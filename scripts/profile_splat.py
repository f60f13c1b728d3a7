"""Capture a jax.profiler device trace of one splat fwd+bwd at 1024^2/100k
and print the top device ops by total duration (parsed from the trace proto).
"""
import glob
import gzip
import json
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
batch = 1

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


float(fb_k(state))  # compile + warm
float(fb_k(state))

logdir = "/tmp/jaxtrace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    v = float(fb_k(state))
print("traced, v=", v, flush=True)

# parse the trace: prefer trace.json.gz (chrome trace events)
files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
agg = {}
total = 0.0
for f in files:
    with gzip.open(f, "rt") as fh:
        tr = json.load(fh)
    pid_names = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{ms:9.3f} ms  {name[:110]}")
print(f"total device op time: {total:.1f} ms (K={K} iters)")
