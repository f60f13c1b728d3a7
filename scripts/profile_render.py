"""Component-level profile of the splat render path on real TPU.

Times (chained-in-jit, RPC floor subtracted): projection, binning sort,
binning scatter relayout, attribute gather+coeff build, Pallas fwd kernel,
full fwd, full fwd+bwd. Run: python scripts/profile_render.py [res] [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussianip_tpu.data.cameras import camera_from_c2w
    from gaussianip_tpu.model.gaussians import create_from_pcd
    from gaussianip_tpu.ops.camera_math import look_at_c2w
    from gaussianip_tpu.ops.knn import mean_dist2_3nn
    from gaussianip_tpu.render.render import RenderConfig, render, _auto_pool
    from gaussianip_tpu.render.binning import bin_instances
    from gaussianip_tpu.render.preprocess import (
        gaussian_power_coeffs, project_gaussians)
    from gaussianip_tpu.render.composite_pallas import composite_tiles

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    d_max = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    n = 100_000

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
    state = jax.device_put(state, jax.devices()[0])

    az = jnp.linspace(0, 2 * jnp.pi, batch, endpoint=False)
    eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                     jnp.full((batch,), 0.2)], -1)
    c2w = look_at_c2w(eye, jnp.zeros((batch, 3)),
                      jnp.tile(jnp.array([[0.0, 0, 1]]), (batch, 1)))
    cams = jax.device_put(jax.vmap(
        lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w),
        jax.devices()[0])
    bg = jnp.zeros(3)
    cfg = RenderConfig(backend="pallas", d_max=d_max)
    tile = cfg.tile
    ntx = nty = -(-res // tile)
    pool = _auto_pool(n, cfg.chunk, res, res)
    print(f"res={res} batch={batch} d_max={cfg.d_max} pool={pool} "
          f"E={4 * n + pool}")

    K = 4

    def chain(f, mix):
        """Build a K-chained jitted fn; mix(carry, state)->state perturbs
        input with the carry so XLA can't CSE iterations."""
        @jax.jit
        def g(state):
            carry = jnp.float32(0.0)
            for _ in range(K):
                st = mix(carry, state)
                carry = f(st)
            return carry
        return g

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

    t_rpc = timeit(trivial, state)
    print(f"rpc_floor_ms={t_rpc*1000:.1f}")

    def mix_op(carry, st):
        # perturb xyz: EVERY stage (projection, binning, compositing) must
        # depend on the carry or XLA hoists it out of the K-chain (CSE)
        return st.replace(xyz=st.xyz + carry * 1e-12)

    deg = state.active_sh_degree
    scales_fn = lambda st: st.get_scaling()

    def proj_only(st):
        xyz = st.xyz
        scales = st.get_scaling()
        opac = st.get_opacity()[:, 0]
        feats = st.get_features()
        active = st.active_mask()
        off = jnp.zeros((batch, n, 2))
        proj = jax.vmap(lambda cam, o: project_gaussians(
            xyz, scales, st.rotation, opac, feats, cam, deg, 1.0, o, None,
            active))(cams, off)
        return sum(jnp.sum(x) for x in
                   [proj.mean2d, proj.depth, proj.color, proj.opacity])

    def proj_and_bin(st):
        xyz = st.xyz
        scales = st.get_scaling()
        opac = st.get_opacity()[:, 0]
        feats = st.get_features()
        active = st.active_mask()
        off = jnp.zeros((batch, n, 2))
        proj = jax.vmap(lambda cam, o: project_gaussians(
            xyz, scales, st.rotation, opac, feats, cam, deg, 1.0, o, None,
            active))(cams, off)
        binning = jax.vmap(lambda m, r, z, v: bin_instances(
            m, r, z, v, tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
            d_max=cfg.d_max, pool=pool, chunk=cfg.chunk, with_inv=True,
        ))(proj.mean2d, proj.radius, proj.depth, proj.valid)
        return (jnp.sum(binning.gidx) + jnp.sum(binning.starts)
                + jnp.sum(binning.counts)).astype(jnp.float32)

    def full_fwd(st):
        out = render(st, cams, bg, cfg)
        return jnp.sum(out.rgb)

    def loss(st, off):
        out = render(st, cams, bg, cfg, mean2d_offset=off)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)

    def full_fwdbwd(st):
        off = jnp.zeros((batch, n, 2))
        g = jax.grad(loss, argnums=(0, 1), allow_int=True)(st, off)
        return jnp.sum(g[1]) + jnp.sum(g[0].xyz)

    results = {}
    for name, f in [("proj", proj_only), ("proj+bin", proj_and_bin),
                    ("fwd", full_fwd), ("fwd+bwd", full_fwdbwd)]:
        g = chain(f, mix_op)
        t = max(timeit(g, state) - t_rpc, 1e-9) / K / batch
        results[name] = t * 1000
        print(f"{name:12s} {t*1000:8.2f} ms/camera")

    print(f"bin_only     {results['proj+bin']-results['proj']:8.2f} ms/camera")
    print(f"composite(+gather) fwd {results['fwd']-results['proj+bin']:8.2f}")
    print(f"bwd_extra    {results['fwd+bwd']-results['fwd']:8.2f} ms/camera")


if __name__ == "__main__":
    main()
