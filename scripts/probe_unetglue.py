"""Glue attribution for the 167 ms UNet+ControlNet denoise step: time the
full step with individual op families monkeypatched to identity (GroupNorm,
LayerNorm, activations, attention, upsample-resize, ControlNet itself).
The baseline-minus-variant delta bounds what that family costs, including
the fusions it blocks. Patching happens before eval_shape so the zero-param
trees stay consistent with the patched graph.

K-chained timing per NOTES (axon tunnel: block_until_ready does not block;
subtract the RPC floor)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as fnn

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
K = 4


def patch():
    if VARIANT == "nogn":
        class _IdGN(fnn.Module):
            num_groups: int = 32
            epsilon: float = 1e-5
            dtype: object = None
            use_bias: bool = True
            use_scale: bool = True

            def __call__(self, x):
                return x

        def gn(num_groups=32, *a, **kw):
            return _IdGN(num_groups)

        fnn.GroupNorm = gn
        import gaussianip_tpu.diffusion.norm as N

        N.FastGroupNorm = gn
    elif VARIANT == "noln":
        class _IdLN(fnn.Module):
            epsilon: float = 1e-5
            dtype: object = None

            def __call__(self, x):
                return x

        def ln(*a, **kw):
            return _IdLN()

        fnn.LayerNorm = ln
    elif VARIANT == "noact":
        fnn.silu = lambda x: x
        fnn.gelu = lambda x, approximate=True: x
    elif VARIANT == "noattn":
        import gaussianip_tpu.diffusion.blocks as B

        B._attend = lambda q, k, v, heads: q
    elif VARIANT == "noresize":
        # nearest 2x via reshape-broadcast instead of jax.image.resize
        import gaussianip_tpu.diffusion.blocks as B

        real = jax.image.resize

        def fast2x(x, shape, method):
            b, h, w, c = x.shape
            if method == "nearest" and shape == (b, h * 2, w * 2, c):
                y = jnp.broadcast_to(x[:, :, None, :, None, :],
                                     (b, h, 2, w, 2, c))
                return y.reshape(b, h * 2, w * 2, c)
            return real(x, shape, method)

        jax.image.resize = fast2x
    elif VARIANT in ("nocn", "lora"):
        pass  # handled below / at config build
    elif VARIANT != "full":
        raise SystemExit(f"unknown variant {VARIANT}")


patch()

from gaussianip_tpu.diffusion.unet import (ControlNetModel,
                                           UNet2DConditionModel, UNetConfig)

ucfg = UNetConfig(lora_rank=0, ip_tokens=4, dtype=jnp.bfloat16)
if VARIANT == "lora":  # the pre-fold configuration (r4 fold_lora A/B)
    ucfg = UNetConfig(lora_rank=128, ip_tokens=4, dtype=jnp.bfloat16)
unet = UNet2DConditionModel(ucfg)
cn = ControlNetModel(UNetConfig(lora_rank=0, ip_tokens=0,
                                dtype=jnp.bfloat16))
key = jax.random.PRNGKey(0)
lat = jnp.zeros((12, 64, 64, 4), jnp.bfloat16)
ts_ = jnp.full((12,), 500, jnp.int32)
ctx = jnp.zeros((12, 81, 768), jnp.bfloat16)
cimg = jnp.zeros((12, 512, 512, 3), jnp.bfloat16)

lat0 = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
t0_ = jnp.zeros((1,), jnp.int32)
ctx0 = jnp.zeros((1, 81, 768), jnp.bfloat16)
cimg0 = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
u_shapes = jax.eval_shape(unet.init, key, lat0, t0_, ctx0)
c_shapes = jax.eval_shape(cn.init, key, lat0, t0_, ctx0, cimg0)
mk = lambda tree: jax.tree_util.tree_map(
    # f32 frozen params (the flax init default): bf16 params MEASURED ~25
    # ms/step SLOWER on the stage-1 step (444.8/448.1 f32 vs 467.2/471.2
    # bf16, r5) and f32 fits HBM in every stage next to the capped
    # attention budget (probe_refinemem) — production load_real_models
    # keeps f32 params for the same reason
    lambda sd: jnp.zeros(sd.shape, sd.dtype), tree)
uparams = mk(u_shapes)
cparams = mk(c_shapes)


@jax.jit
def denoise_k(uparams, cparams, lat):
    carry = jnp.float32(0.0)
    for _ in range(K):
        l2 = lat + (carry * 1e-12).astype(lat.dtype)
        if VARIANT == "nocn":
            dr, mid = None, None
        else:
            dr, mid = cn.apply(cparams, l2, ts_, ctx, cimg)
        eps, _ = unet.apply(uparams, l2, ts_, ctx,
                            down_block_residuals=dr, mid_block_residual=mid)
        carry = jnp.sum(eps.astype(jnp.float32))
    return carry


@jax.jit
def trivial(lat):
    return jnp.sum(lat.astype(jnp.float32))


def timeit(f, *args, reps=4):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


t0 = time.time()
t_rpc = timeit(trivial, lat)
print(f"[{time.time()-t0:.0f}s] rpc {t_rpc*1e3:.1f} ms", flush=True)
t = max(timeit(denoise_k, uparams, cparams, lat) - t_rpc, 1e-9) / K
print(f"[{time.time()-t0:.0f}s] variant={VARIANT}  {t*1e3:7.2f} ms/step",
      flush=True)
