"""Compare fwd-kernel variants on the real 1024^2 scene: v2 (dynamic-slot
double buffer), sync single buffer, static-parity double buffer."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianip_tpu.data.cameras import camera_from_c2w
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.camera_math import look_at_c2w
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig, _auto_pool, _gather_rows
from gaussianip_tpu.render.binning import INLINE, bin_instances
from gaussianip_tpu.render.preprocess import (gaussian_power_coeffs,
                                              project_gaussians)
from gaussianip_tpu.render import composite_pallas as cp

dev = jax.devices()[0]
res, batch, n = 1024, 1, 100_000
rng = np.random.default_rng(0)
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
state = jax.device_put(state, dev)
az = jnp.linspace(0, 2 * jnp.pi, batch, endpoint=False)
eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                 jnp.full((batch,), 0.2)], -1)
c2w = look_at_c2w(eye, jnp.zeros((batch, 3)),
                  jnp.tile(jnp.array([[0.0, 0, 1]]), (batch, 1)))
cams = jax.device_put(jax.vmap(
    lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w), dev)
cfg = RenderConfig(backend="pallas")
tile, chunk, d_max = cfg.tile, cfg.chunk, cfg.d_max
ntx = nty = res // tile
nt = ntx * nty
pool = _auto_pool(n, chunk, res, res)
e_tot = INLINE * n + pool
epad = (-(-(e_tot + chunk) // chunk)) * chunk + chunk

deg = state.active_sh_degree
off = jnp.zeros((batch, n, 2))
proj = jax.jit(jax.vmap(lambda cam, o: project_gaussians(
    state.xyz, state.get_scaling(), state.rotation,
    state.get_opacity()[:, 0], state.get_features(), cam, deg, 1.0, o, None,
    state.active_mask())))(cams, off)
binning = jax.jit(jax.vmap(functools.partial(
    bin_instances, tile=tile, n_tiles_x=ntx, n_tiles_y=nty, d_max=d_max,
    pool=pool, chunk=chunk, with_inv=False)))(
    proj.mean2d, proj.radius, proj.depth, proj.valid)
packed = jnp.concatenate([
    proj.mean2d, proj.conic, (proj.opacity * jnp.ones((batch, n)))[..., None],
    proj.color, proj.depth[..., None]], axis=-1)
gidx_safe = jnp.minimum(binning.gidx, n - 1)
inst = jnp.take_along_axis(packed, gidx_safe[..., None], axis=1)
rv = (binning.gidx < n)[..., None]
inst = jnp.where(rv, inst, 0.0)
tile_safe = jnp.minimum(binning.tile_of, nt - 1)
origin = jnp.stack([(tile_safe % ntx) * tile, (tile_safe // ntx) * tile],
                   axis=-1).astype(jnp.float32)
local = inst[..., 0:2] - origin
coeff6 = gaussian_power_coeffs(local, inst[..., 2:5], inst[..., 5])
coeff8 = jnp.where(rv, jnp.concatenate(
    [coeff6, jnp.zeros_like(coeff6[..., :2])], axis=-1), 0.0)
ones = jnp.ones_like(inst[..., 9])
zeros = jnp.zeros_like(ones)
feat8 = jnp.where(rv, jnp.stack(
    [inst[..., 6], inst[..., 7], inst[..., 8], inst[..., 9], ones, zeros,
     zeros, zeros], axis=-1), 0.0)
data = jnp.swapaxes(jnp.concatenate([coeff8, feat8], axis=-1), 1, 2)
data = jax.device_put(jnp.pad(data, ((0, 0), (0, 0), (0, epad - e_tot))), dev)
starts, cnts = jax.device_put((binning.starts, binning.counts), dev)


# ---- variant: sync single-buffer ----
def k_sync(starts_ref, counts_ref, data_hbm, featpix_ref, out_ref, buf, sems,
           *, chunk, tile):
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = starts_ref[b, t]
    count = counts_ref[b, t]
    base = (start // chunk) * chunk
    head = start - base
    total = head + count
    nchunks = jnp.where(count > 0, (total + chunk - 1) // chunk, 0)
    p = tile * tile
    featpix = featpix_ref[:]
    tri_ex = cp._tri(chunk, strict=True, upper=False)
    out_ref[0, 0] = jnp.zeros((8, p), jnp.float32)
    log_eps = jnp.float32(-9.22)

    def cond(carry):
        ci, log_t, last = carry
        return (ci < nchunks) & (jnp.max(log_t) >= log_eps)

    def body(carry):
        ci, log_t, last = carry
        c = cp._data_copy(data_hbm, buf, sems, b, base, ci, 0, chunk)
        c.start()
        c.wait()
        coeff = buf[0, 0:8]
        feat = buf[0, 8:16]
        raw, alpha, log_om = cp._chunk_alphas(coeff, featpix, head, total,
                                              ci, chunk)
        cum_ex = cp._dot(tri_ex, log_om, ((1,), (0,)))
        t_excl = jnp.exp(log_t + cum_ex)
        t_incl = t_excl * (1.0 - alpha)
        contrib = (t_incl >= cp.T_EPS) & (alpha > 0.0)
        w = jnp.where(contrib, alpha * t_excl, 0.0)
        out_ref[0, 0] += cp._dot(feat, w, ((1,), (0,)))
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, p), 0)
        idxf = (rows + ci * chunk).astype(jnp.float32)
        last = jnp.maximum(last, jnp.max(jnp.where(contrib, idxf, -1.0),
                                         axis=0, keepdims=True))
        log_t_new = (log_t + cum_ex[chunk - 1:chunk, :]
                     + log_om[chunk - 1:chunk, :])
        return (ci + 1, log_t_new, last)

    _, _, last = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros((1, p), jnp.float32),
         jnp.full((1, p), -1.0, jnp.float32)))
    out_ref[0, 0, 5:6, :] = last


def grid_spec(nbuf):
    p = tile * tile
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, p), lambda bb, tt, sb, st: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, p),
                               lambda bb, tt, sb, st: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, 16, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )


featpix_host = cp._pixel_features(tile)


def make(kernel, nbuf):
    @jax.jit
    def run(data):
        s = jnp.float32(0.0)
        for _ in range(6):
            out = pl.pallas_call(
                functools.partial(kernel, chunk=chunk, tile=tile),
                grid_spec=grid_spec(nbuf),
                out_shape=jax.ShapeDtypeStruct((batch, nt, 8, tile * tile),
                                               jnp.float32),
            )(starts, cnts, data + s * 1e-12, featpix_host)
            s = jnp.sum(out[:, ::16, :5])
        return s
    return run


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


@jax.jit
def trivial(x):
    return jnp.sum(x[0, :, :8])


t_rpc = timeit(trivial, data)
print(f"rpc={t_rpc*1000:.1f}ms")
def make_chunk(ch):
    @jax.jit
    def run(data):
        s = jnp.float32(0.0)
        for _ in range(6):
            out = pl.pallas_call(
                functools.partial(cp._fwd_kernel, chunk=ch, tile=tile),
                grid_spec=grid_spec_ch(ch),
                out_shape=jax.ShapeDtypeStruct((batch, nt, 8, tile * tile),
                                               jnp.float32),
            )(starts, cnts, data + s * 1e-12, featpix_host)
            s = jnp.sum(out[:, ::16, :5])
        return s
    return run


def grid_spec_ch(ch):
    p = tile * tile
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, p), lambda bb, tt, sb, st: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, p),
                               lambda bb, tt, sb, st: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, ch), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


outs = {}
for ch in (128, 256, 512):
    r = make_chunk(ch)
    outs[ch] = float(r(data))
    t = max(timeit(r, data) - t_rpc, 1e-9) / 6
    print(f"v2 chunk={ch}: {t*1000:7.2f} ms  out={outs[ch]:.2f}")
print("outputs consistent:",
      all(abs(outs[c] - outs[128]) < 1e-3 * abs(outs[128]) for c in outs))
