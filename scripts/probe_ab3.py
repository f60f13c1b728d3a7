"""End-to-end fwd+bwd A/B at 1024^2/100k: inv_mode and carry_gid."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussianip_tpu.data.cameras import camera_from_c2w
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.camera_math import look_at_c2w
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig, render

rng = np.random.default_rng(0)
n = 100_000; res = 1024
z = rng.uniform(-0.85, 0.85, n); th = rng.uniform(0, 2*np.pi, n)
r = 0.25*np.sqrt(np.maximum(0.0, 1-(z/0.9)**2)) + 0.03
pts = np.stack([r*np.cos(th), r*np.sin(th), z], 1).astype(np.float32)
pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
state = create_from_pcd(pts, cols, n, mean_dist2_3nn(jnp.asarray(pts), block=4096))
state = state.replace(opacity=jnp.asarray(rng.uniform(-1.0, 2.5, (n, 1)).astype(np.float32)))
c2w = look_at_c2w(jnp.array([[1.8, 0.0, 0.2]]), jnp.zeros((1, 3)), jnp.array([[0., 0, 1]]))
cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
bg = jnp.zeros(3); K = 3

@jax.jit
def trivial(s): return jnp.sum(s.opacity)

def timeit(f, *a, reps=3):
    float(f(*a)); ts = []
    for _ in range(reps):
        t0 = time.time(); float(f(*a)); ts.append(time.time()-t0)
    return min(ts)

rpc = timeit(trivial, state)
print(f"rpc {rpc*1e3:.1f} ms", flush=True)
for name, cfg in [
    ("base(sort,gid)", RenderConfig(backend="pallas")),
    ("inv=scatter", RenderConfig(backend="pallas", inv_mode="scatter")),
    ("gid=recover", RenderConfig(backend="pallas", carry_gid=False)),
    ("scatter+recover", RenderConfig(backend="pallas", inv_mode="scatter", carry_gid=False)),
]:
    def loss(st, off):
        out = render(st, cams, bg, cfg, mean2d_offset=off)
        return jnp.sum(out.rgb**2) + jnp.sum(out.alpha) + jnp.sum(out.depth)
    @jax.jit
    def fb_k(state):
        carry = jnp.float32(0.0); off = jnp.zeros((1, n, 2))
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry*1e-12)
            g = jax.grad(loss, argnums=(0, 1), allow_int=True)(st, off)
            carry = jnp.sum(g[1]) + jnp.sum(g[0].xyz)
        return carry
    t = max(timeit(fb_k, state) - rpc, 1e-9)/K
    print(f"{name:18s}: fwd+bwd {t*1e3:7.2f} ms, {1/t:6.2f} renders/s", flush=True)
