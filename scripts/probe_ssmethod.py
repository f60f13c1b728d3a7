"""A/B jnp.searchsorted methods inside the real proj+bin chain (trusted
perturb-xyz chain structure from probe_r3b: 22.2 ms baseline at 1024^2/100k).
"""
import os
import sys
import time
import functools

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
from gaussianip_tpu.render.render import RenderConfig, _auto_pool
import gaussianip_tpu.render.binning as B
from gaussianip_tpu.render.preprocess import project_gaussians

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
cfg = RenderConfig(backend="pallas")

K = 4
tile, chunk, d_max = cfg.tile, cfg.chunk, cfg.d_max
ntx = nty = res // tile
pool = _auto_pool(n, chunk, res, res)

orig_ss = jnp.searchsorted


def chain(with_inv):
    @jax.jit
    def f(state):
        carry = jnp.float32(0.0)
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            xyz = st.xyz
            off = jnp.zeros((batch, n, 2))
            proj = jax.vmap(
                lambda cam, o: project_gaussians(
                    xyz, st.get_scaling(), st.rotation,
                    st.get_opacity()[:, 0], st.get_features(), cam,
                    st.active_sh_degree, 1.0, o, None,
                    st.active_mask()))(cams, off)
            bb = jax.vmap(
                lambda m, r_, z_, v: B.bin_instances(
                    m, r_, z_, v, tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
                    d_max=d_max, pool=pool, chunk=chunk, with_inv=with_inv,
                ))(proj.mean2d, proj.radius_bin, proj.depth, proj.valid)
            carry = (jnp.sum(bb.counts).astype(jnp.float32)
                     + jnp.sum(bb.gidx[:, :8]).astype(jnp.float32)
                     + jnp.sum(bb.inv_em[:, :4]).astype(jnp.float32))
        return carry
    return f


@jax.jit
def trivial(state):
    return jnp.sum(state.opacity)


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
t_rpc = timeit(trivial, state)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)

for method in ["scan", "sort", "scan_unrolled"]:
    B.jnp = jnp  # ensure module ref
    patched = functools.partial(orig_ss, method=method)
    jnp_dict = jnp.searchsorted
    # patch the module-level jnp.searchsorted used inside binning
    import jax.numpy as _jnp
    _jnp.searchsorted = patched
    try:
        for with_inv in [False, True]:
            f = chain(with_inv)
            t = max(timeit(f, state) - t_rpc, 1e-9) / K
            print(f"[{time.time()-t0:.0f}s] ss={method:14s} inv={with_inv}: "
                  f"{t*1e3:7.2f} ms", flush=True)
    finally:
        _jnp.searchsorted = orig_ss
