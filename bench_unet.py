"""Standalone UNet+ControlNet denoise-rate benchmark (stage-1 workload:
3-way CFG x batch 4 = 12 latents of 64^2 x 4, bf16, SD1.5 architecture).
Run by bench.py in a subprocess so its large compile cannot blow the main
benchmark's budget. Prints one JSON line."""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    try:
        os.makedirs(".jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from gaussianip_tpu.diffusion.unet import (
        ControlNetModel, UNet2DConditionModel, UNetConfig)

    # production shapes (system/pipeline.load_guidance_models): the UNet
    # ships with the IPA LoRA FOLDED into the base kernels (lora_rank=0 at
    # runtime, weights.fold_lora) and the ControlNet never had LoRA/IP
    # tokens (reference installs IPA processors into the UNet only,
    # ip_adapter_faceid.py:286-329). Earlier rounds benchmarked a CN with
    # rank-128 LoRA + a runtime-LoRA UNet — heavier than what ships
    ucfg = UNetConfig(lora_rank=0, ip_tokens=4, dtype=jnp.bfloat16)
    unet = UNet2DConditionModel(ucfg)
    cn = ControlNetModel(UNetConfig(lora_rank=0, ip_tokens=0,
                                    dtype=jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((12, 64, 64, 4), jnp.bfloat16)
    ts_ = jnp.full((12,), 500, jnp.int32)
    ctx = jnp.zeros((12, 81, 768), jnp.bfloat16)
    cimg = jnp.zeros((12, 512, 512, 3), jnp.bfloat16)
    # params via eval_shape + zeros directly on the TPU: actually running
    # init takes minutes (on host CPU) or bakes 5GB constants (jit through
    # the remote-compile tunnel); a throughput benchmark only needs shapes
    import sys
    t0 = time.time()
    lat0 = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
    t0_ = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, 81, 768), jnp.bfloat16)
    cimg0 = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    u_shapes = jax.eval_shape(unet.init, key, lat0, t0_, ctx0)
    c_shapes = jax.eval_shape(cn.init, key, lat0, t0_, ctx0, cimg0)

    # ONE device dispatch for the whole zero tree: per-leaf jnp.zeros costs
    # one tunnel RPC each (~45 s measured for the ~700 leaves, r4)
    @jax.jit
    def mk_all():
        z = lambda sd: jnp.zeros(sd.shape, sd.dtype)
        return (jax.tree_util.tree_map(z, u_shapes),
                jax.tree_util.tree_map(z, c_shapes))

    uparams, cparams = mk_all()
    jax.block_until_ready((uparams, cparams))
    print(f"param alloc: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    # params/activations must be ARGUMENTS: closing over them bakes large
    # constants (params ~5GB, cimg 18MB) into the lowered graph, which the
    # remote compiler digests slowly or not at all
    # K-chained steady-state (NOTES gotcha 1 — same methodology as the
    # splat bench): carry feeds the next iteration so XLA can't CSE; the
    # single-dispatch variant over-reported by ~13 ms of per-call arg
    # streaming (r4: 168 ms dispatch-timed vs 155 ms chained)
    K = 4

    @jax.jit
    def denoise_1(uparams, cparams, lat, ts_, ctx, cimg):
        carry = jnp.float32(0.0)
        for _ in range(K):
            l2 = lat + (carry * 1e-12).astype(lat.dtype)
            dr, mid = cn.apply(cparams, l2, ts_, ctx, cimg)
            eps, _ = unet.apply(uparams, l2, ts_, ctx,
                                down_block_residuals=dr,
                                mid_block_residual=mid)
            carry = jnp.sum(eps.astype(jnp.float32))
        return carry

    @jax.jit
    def trivial(lat):
        return jnp.sum(lat.astype(jnp.float32))

    def timeit(f, *args, reps=5):
        float(f(*args))
        ts0 = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*args))
            ts0.append(time.time() - t0)
        return min(ts0)

    t_rpc = timeit(trivial, lat)
    print(f"rpc floor: {t_rpc*1e3:.0f}ms at {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)
    t = max(timeit(denoise_1, uparams, cparams, lat, ts_, ctx, cimg) - t_rpc,
            1e-9) / K
    print(json.dumps({"unet_denoise_steps_per_s": round(1.0 / t, 2),
                      "unet_denoise_ms": round(t * 1000, 2)}))


if __name__ == "__main__":
    main()
