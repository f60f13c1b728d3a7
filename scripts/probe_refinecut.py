"""Stage-2 refine attribution: (a) chunked-attention chunk-size sweep at
the 1024^2-refine shapes (S=16384 self / 3x16384 dense KV — the layers
that force the online-softmax path), (b) one K-chained call of each phase
graph (store/key/dense) and the VAE encode/decode sweeps.

The full refine measured 313.8 s (r5 bench_pipeline, 32 views x 8 steps);
64 phase calls + 2 VAE sweeps must account for it or the residual is
dispatch glue. Reference workload: refine.py:161-239 + __call_refine__.
Usage: probe_refinecut.py [attn|phases] (default both)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

which = set(sys.argv[1:]) or {"attn", "phases"}
t0 = time.time()


@jax.jit
def trivial(x):
    return jnp.sum(x.astype(jnp.float32))


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        tc = time.time()
        float(f(*args))
        ts.append(time.time() - tc)
    return min(ts)


rng = np.random.default_rng(0)
x0 = jnp.zeros((256, 256), jnp.float32)
t_rpc = timeit(trivial, x0)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)

if "attn" in which:
    import gaussianip_tpu.diffusion.blocks as B

    b, h, s, d = 8, 8, 16384, 40
    K = 4
    q = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.bfloat16)

    def make(sk):
        k = jnp.asarray(rng.normal(0, 1, (b, sk, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (b, sk, h, d)), jnp.bfloat16)

        @jax.jit
        def f(q, k, v):
            carry = jnp.float32(0.0)
            for _ in range(K):
                q2 = q + (carry * 1e-12).astype(q.dtype)
                o = B._attend_chunked(q2, k, v)
                carry = jnp.sum(o.astype(jnp.float32))
            return carry

        return f, k, v

    for sk_name, sk in (("self", s), ("dense3x", 3 * s)):
        for qc, kc in ((1024, 1024), (2048, 2048), (4096, 2048),
                       (2048, 4096), (4096, 4096), (512, 4096)):
            os.environ["GIP_ATTN_Q_CHUNK"] = str(qc)
            os.environ["GIP_ATTN_KV_CHUNK"] = str(kc)
            f, k, v = make(sk)
            t = max(timeit(f, q, k, v) - t_rpc, 1e-9) / K
            print(f"[{time.time()-t0:.0f}s] attn {sk_name:7s} q{qc:5d} "
                  f"k{kc:5d} {t*1e3:8.2f} ms", flush=True)

if "phases" in which:
    from gaussianip_tpu.diffusion.scheduler import make_ddim_schedule
    from gaussianip_tpu.diffusion.unet import (ControlNetModel,
                                               UNet2DConditionModel,
                                               UNetConfig)
    from gaussianip_tpu.diffusion.vae import AutoencoderKL, VAEConfig
    from gaussianip_tpu.system.refine import RefineModels, make_refine_step

    key = jax.random.PRNGKey(0)
    mk = lambda tree: jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), tree)
    ucfg = UNetConfig(lora_rank=128, ip_tokens=4, dtype=jnp.bfloat16)
    unet = UNet2DConditionModel(ucfg)
    cn = ControlNetModel(UNetConfig(dtype=jnp.bfloat16))
    vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16))
    lat0 = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
    t0_ = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, 81, 768), jnp.bfloat16)
    cimg0 = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    up = mk(jax.eval_shape(unet.init, key, lat0, t0_, ctx0))
    cp = mk(jax.eval_shape(cn.init, key, lat0, t0_, ctx0[:, :77], cimg0))
    vp = mk(jax.eval_shape(
        vae.init, key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16)))
    rm = RefineModels(unet, up, cn, cp, vae, vp)
    ddim = make_ddim_schedule()

    os.environ["GIP_ATTN_SCORE_BYTES"] = "2e9"
    run = make_refine_step(rm, ddim, 7.5, 0.6)
    lat_full = jnp.zeros((32, 128, 128, 4), jnp.float32)
    ctx8 = jnp.zeros((8, 81, 768), jnp.bfloat16)
    ctrl4 = jnp.zeros((4, 1024, 1024, 3), jnp.bfloat16)
    vi4 = jnp.arange(4, dtype=jnp.int32)
    idx8 = jnp.arange(8, dtype=jnp.int32)

    def sync(x):
        jax.device_get(x[0, 0, 0, 0])

    # phase A (store): time by repeated sync'd calls (the cache output is
    # a big pytree; K-chaining through it is impractical — accept the
    # ~30 ms RPC floor, report it separately)
    def t_store():
        l, ca = run(lat_full, 800, 780, ctx8, ctrl4, vcr_mode="store",
                    view_idx=vi4)
        sync(l)
        ts = []
        for _ in range(3):
            tc = time.time()
            l, ca = run(lat_full, 800, 780, ctx8, ctrl4, vcr_mode="store",
                        view_idx=vi4)
            sync(l)
            ts.append(time.time() - tc)
        return min(ts), ca

    t_a, cache_a = t_store()
    print(f"[{time.time()-t0:.0f}s] phase store  {t_a*1e3:8.1f} ms "
          f"(incl ~{t_rpc*1e3:.0f} ms rpc)", flush=True)

    l, cache_k = run(lat_full, 800, 780, ctx8, ctrl4, vcr_mode="key",
                     vcr_cache=(cache_a,), vcr_idx=(idx8[:8],),
                     view_idx=vi4)
    sync(l)
    ts = []
    for _ in range(3):
        tc = time.time()
        l, cache_k = run(lat_full, 800, 780, ctx8, ctrl4, vcr_mode="key",
                         vcr_cache=(cache_a,), vcr_idx=(idx8[:8],),
                         view_idx=vi4)
        sync(l)
        ts.append(time.time() - tc)
    print(f"[{time.time()-t0:.0f}s] phase key    {min(ts)*1e3:8.1f} ms",
          flush=True)

    comb = jax.jit(lambda a, k: [jnp.concatenate([x, y], axis=0)
                                 for x, y in zip(a, k)])(cache_a, cache_k)
    w = {"w_l": 0.75, "w_r": 0.25, "lambda_self": 0.55}
    l, _ = run(lat_full, 800, 780, ctx8, ctrl4, vcr_mode="dense",
               vcr_cache=(comb,), vcr_idx=(idx8, idx8), vcr_weights=w,
               view_idx=vi4)
    sync(l)
    ts = []
    for _ in range(3):
        tc = time.time()
        l, _ = run(lat_full, 800, 780, ctx8, ctrl4, vcr_mode="dense",
                   vcr_cache=(comb,), vcr_idx=(idx8, idx8), vcr_weights=w,
                   view_idx=vi4)
        sync(l)
        ts.append(time.time() - tc)
    print(f"[{time.time()-t0:.0f}s] phase dense  {min(ts)*1e3:8.1f} ms",
          flush=True)

    img32 = jnp.zeros((32, 1024, 1024, 3), jnp.bfloat16)

    @jax.jit
    def enc(p, img):
        ch = img.reshape(16, 2, 1024, 1024, 3)
        return jax.lax.map(
            lambda c: vae.apply(p, c * 2 - 1, method=vae.encode), ch)

    @jax.jit
    def dec(p, lat):
        ch = lat.reshape(16, 2, 128, 128, 4)
        return jax.lax.map(lambda c: vae.apply(p, c, method=vae.decode), ch)

    o = enc(vp, img32); jax.device_get(o[0, 0, 0, 0, 0])
    ts = []
    for _ in range(2):
        tc = time.time()
        o = enc(vp, img32); jax.device_get(o[0, 0, 0, 0, 0])
        ts.append(time.time() - tc)
    print(f"[{time.time()-t0:.0f}s] vae encode32 {min(ts):8.2f} s", flush=True)
    lat32 = jnp.zeros((32, 128, 128, 4), jnp.bfloat16)
    o = dec(vp, lat32); jax.device_get(o[0, 0, 0, 0, 0])
    ts = []
    for _ in range(2):
        tc = time.time()
        o = dec(vp, lat32); jax.device_get(o[0, 0, 0, 0, 0])
        ts.append(time.time() - tc)
    print(f"[{time.time()-t0:.0f}s] vae decode32 {min(ts):8.2f} s", flush=True)
