"""Stage-2 VCR: view-consistent multi-view refinement.

Behavioral rebuild of the reference's refine pass (reference:
threestudio/models/guidance/refine.py:26-332 +
models/pipeline_ipa_controlnet.py __call_refine__:1447-1876): render 32 orbit
views of the stage-1 avatar, re-noise each at step 43/50 of the DDIM ladder,
and re-denoise 8 steps with mutual attention sharing self-attention states
across views:

  phase A — 4 anchors (front=view24, back=8, left=16, right=0) denoise while
    *storing* their per-step up-block attn1 hidden states;
  phase B — 4 key views (k0=20, k1=28, k2=4, k3=12) attend over
    concat(self, front|back anchor) and store their own states;
  phase C — 24 dense views blend self-attention with attention into their
    two neighboring key views (weights 0.75/0.5/0.25, lambda_self=0.55).

TPU-first: phase C is embarrassingly parallel — the reference runs all 32
views sequentially on one GPU; here dense views are grouped by their
mutual-attention weight class (3 classes x 8 views) and each class runs as
one batched, *mesh-sharded* denoise: pass `mesh=` (a 1-D 'data' mesh) and
the view batch, its CFG pair, and the per-view K/V sources shard over
devices while the UNet/ControlNet weights replicate — XLA inserts the
collectives over ICI. Anchors/keys stay sequential (their attention states
feed later phases). Every denoise step is one jitted CFG-pair
UNet+ControlNet call with the cache threaded functionally.

View-specific prompts (refine.py:671-684): anchors get ', back/left/right
view' suffixes, key views ', left front view' etc., dense views the base
prompt.
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.scheduler import (
    DDIMSchedule,
    add_noise,
    ddim_step,
    make_ddim_schedule,
    refine_timestep_ladder,
)

# processing order and names (reference: refine.py:669-670)
VIEW_IDX_ALL = [24, 8, 16, 0, 20, 28, 4, 12, 17, 18, 19, 21, 22, 23, 25, 26,
                27, 29, 30, 31, 1, 2, 3, 5, 6, 7, 9, 10, 11, 13, 14, 15]
VIEW_NAME_ALL = ["front", "back", "left", "right", "k0", "k1", "k2", "k3"] + [
    f"v{i}" for i in range(24)]

PROMPT_SUFFIX = {
    "front": "", "back": ", back view", "left": ", left view",
    "right": ", right view", "k0": ", left front view",
    "k1": ", right front view", "k2": ", right back view",
    "k3": ", left back view",
}
REFINE_NEGATIVE_PROMPT = ("blurry face, bad face, poorly drawn face, "
                          "duplicate face, extra fingers, blurry, fused fingers")

# dense view -> (left key view, right key view) and weights
# (reference: refine.py:685-698)
KEY_VIEW_NAME_PAIR = {
    "v0": ("left", "k0"), "v1": ("left", "k0"), "v2": ("left", "k0"),
    "v3": ("k0", "front"), "v4": ("k0", "front"), "v5": ("k0", "front"),
    "v6": ("front", "k1"), "v7": ("front", "k1"), "v8": ("front", "k1"),
    "v9": ("k1", "right"), "v10": ("k1", "right"), "v11": ("k1", "right"),
    "v12": ("right", "k2"), "v13": ("right", "k2"), "v14": ("right", "k2"),
    "v15": ("k2", "back"), "v16": ("k2", "back"), "v17": ("k2", "back"),
    "v18": ("back", "k3"), "v19": ("back", "k3"), "v20": ("back", "k3"),
    "v21": ("k3", "left"), "v22": ("k3", "left"), "v23": ("k3", "left"),
}
KEY_VIEW_WEIGHT_PAIR = {
    f"v{i}": [(0.75, 0.25), (0.5, 0.5), (0.25, 0.75)][i % 3] for i in range(24)
}
ANCHOR_OF_KEY = {"k0": "front", "k1": "front", "k2": "back", "k3": "back"}

LAMBDA_SELF = 0.55
NUM_REFINE_STEPS = 8

# crop window + half-res the stage-3 targets (reference: refine.py:309-315,
# GaussianIP.py:427-428)
CROP_Y = (60, 890)
CROP_X = (220, 800)


class RefineModels(NamedTuple):
    unet: object
    unet_params: object
    controlnet: object
    controlnet_params: object
    vae: object
    vae_params: object


def _cfg_eps(eps, guidance_scale):
    e_uncond, e_cond = jnp.split(eps, 2, axis=0)
    return e_uncond + guidance_scale * (e_cond - e_uncond)


def make_refine_step(models: RefineModels, ddim: DDIMSchedule,
                     guidance_scale: float, ip_scale: float, mesh=None):
    """One jitted denoise step on a CFG-doubled batch with a VCR mode.

    mesh: optional 1-D 'data' jax.sharding.Mesh — the CFG-doubled view
    batch (and the VCR K/V sources) shard over it."""

    def _shard(tree):
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        def c(a):
            if not hasattr(a, "ndim") or a.ndim == 0:
                return a
            if a.shape[0] % mesh.devices.size == 0:
                return jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, P("data")))
            return a

        return jax.tree_util.tree_map(c, tree)

    def step(latents, t, t_prev, context, control, vcr_mode, vcr_cache,
             vcr_weights):
        lat_in = _shard(jnp.concatenate([latents] * 2, axis=0))
        t_in = jnp.full((lat_in.shape[0],), t, jnp.int32)
        ctrl_in = _shard(jnp.concatenate([control] * 2, axis=0))
        context = _shard(context)
        vcr_cache = _shard(vcr_cache)
        down_res, mid = models.controlnet.apply(
            models.controlnet_params, lat_in, t_in, context, ctrl_in,
            conditioning_scale=1.0,
        )
        eps, cache = models.unet.apply(
            models.unet_params, lat_in, t_in, context,
            down_block_residuals=down_res, mid_block_residual=mid,
            ip_scale=ip_scale, vcr_mode=vcr_mode, vcr_cache=vcr_cache,
            vcr_weights=vcr_weights,
        )
        eps = _cfg_eps(eps, guidance_scale)
        new_latents = ddim_step(ddim, eps, jnp.full((latents.shape[0],), t),
                                jnp.full((latents.shape[0],), t_prev), latents)
        return new_latents, cache

    jitted = {}

    def run(latents, t, t_prev, context, control, vcr_mode="off",
            vcr_cache=None, vcr_weights=None):
        key = (vcr_mode, latents.shape)
        if key not in jitted:
            jitted[key] = jax.jit(
                lambda l, tt, tp, cx, ct, vc, vw: step(
                    l, tt, tp, cx, ct, vcr_mode, vc, vw),
            )
        return jitted[key](latents, t, t_prev, context, control, vcr_cache,
                           vcr_weights)

    return run


def refine_views(
    models: RefineModels,
    images,  # [32, H, W, 3] float in [0, 1] (stage-1 renders)
    control_images,  # [32, H, W, 3] pose maps
    contexts,  # dict name -> [2, S(+ip), D] CFG-pair conditioning per view
    key,
    ddim: Optional[DDIMSchedule] = None,
    num_steps: int = NUM_REFINE_STEPS,
    num_ladder: int = 50,
    guidance_scale: float = 7.5,
    ip_scale: float = 0.6,  # refine uses scale 0.6 (reference: refine.py:784)
    lambda_self: float = LAMBDA_SELF,
    dense_batch: int = 8,
    mesh=None,
):
    """Returns refined images [32, H, W, 3] in canonical view order.

    mesh: optional 1-D 'data' jax.sharding.Mesh; the dense phase (24 of 32
    views, grouped into 3 weight classes of 8) shards its view batch over
    the devices. dense_batch caps the per-call group size (memory)."""
    n_views = images.shape[0]
    assert n_views == 32, "the VCR topology is defined for 32 views"
    ddim = ddim or make_ddim_schedule()
    ladder = np.asarray(refine_timestep_ladder(num_ladder))
    steps = ladder[-num_steps:]  # descending
    t0 = int(steps[0])

    # shared noise across all views (reference: refine.py:740-741)
    k_noise, _ = jax.random.split(key)

    vae = models.vae

    def encode(img):
        x = img * 2.0 - 1.0
        return vae.apply(models.vae_params, x, method=vae.encode)

    def decode(lat):
        x = vae.apply(models.vae_params, lat, method=vae.decode)
        return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)

    latents0 = encode(images)  # [32, h, w, 4]
    noise = jax.random.normal(k_noise, latents0.shape[1:])[None]
    t_arr = jnp.full((n_views,), t0)
    latents_noisy = add_noise(ddim, latents0, jnp.broadcast_to(noise, latents0.shape), t_arr)

    run_step = make_refine_step(models, ddim, guidance_scale, ip_scale,
                                mesh=mesh)
    prevs = list(steps[1:]) + [-1]

    stored: Dict[str, List] = {}  # name -> per-step list of per-layer caches
    refined = [None] * n_views

    def denoise_view(name, view_idx, vcr_mode, cache_per_step=None,
                     weights=None, batch_names=None):
        lat = latents_noisy[view_idx] if isinstance(view_idx, int) else (
            latents_noisy[jnp.asarray(view_idx)])
        if isinstance(view_idx, int):
            lat = lat[None]
            ctrl = control_images[view_idx][None]
            ctx = contexts[name]
        else:
            ctrl = control_images[jnp.asarray(view_idx)]
            # stack CFG pairs: [uncond...; cond...]
            un = jnp.stack([contexts[n_][0] for n_ in batch_names])
            co = jnp.stack([contexts[n_][1] for n_ in batch_names])
            ctx = jnp.concatenate([un, co], axis=0)
        if isinstance(view_idx, int):
            ctx = contexts[name]  # already [2, S, D]
        caches = []
        for si, (t, tp) in enumerate(zip(steps, prevs)):
            vc = None if cache_per_step is None else cache_per_step(si, lat.shape[0])
            lat, cache = run_step(lat, int(t), int(tp), ctx, ctrl,
                                  vcr_mode=vcr_mode, vcr_cache=vc,
                                  vcr_weights=weights)
            if cache is not None:
                caches.append(cache)
        return lat, caches

    # phase A: anchors store
    for name in ["front", "back", "left", "right"]:
        vi = VIEW_IDX_ALL[VIEW_NAME_ALL.index(name)]
        lat, caches = denoise_view(name, vi, "store")
        stored[name] = caches
        refined[vi] = decode(lat)[0]

    # phase B: key views (concat with their anchor, store their own)
    for name in ["k0", "k1", "k2", "k3"]:
        vi = VIEW_IDX_ALL[VIEW_NAME_ALL.index(name)]
        anchor = ANCHOR_OF_KEY[name]

        def cache_fn(si, b, anchor=anchor):
            return stored[anchor][si]

        lat, caches = denoise_view(name, vi, "key", cache_per_step=cache_fn)
        stored[name] = caches
        refined[vi] = decode(lat)[0]

    # phase C: dense views, grouped by mutual-attention weight class so each
    # batch is uniform (3 classes x 8 views); each class batch runs in
    # dense_batch-capped slices, mesh-sharded when a mesh is given
    groups: Dict = {}
    for n_ in [f"v{i}" for i in range(24)]:
        vi = VIEW_IDX_ALL[VIEW_NAME_ALL.index(n_)]
        w = KEY_VIEW_WEIGHT_PAIR[n_]
        groups.setdefault(w, []).append((n_, vi))
    for (w_l, w_r), class_members in groups.items():
        for g0 in range(0, len(class_members), dense_batch):
            members = class_members[g0 : g0 + dense_batch]
            mnames = [m[0] for m in members]
            midxs = [m[1] for m in members]

            def cache_fn(si, b, mnames=mnames):
                # batch the per-layer sources over group members x CFG pair
                def stack(side):
                    per_layer = []
                    n_layers = len(stored["front"][si])
                    for li in range(n_layers):
                        uns, cos = [], []
                        for n_ in mnames:
                            src_name = KEY_VIEW_NAME_PAIR[n_][side]
                            arr = stored[src_name][si][li]  # [2, S, D]
                            uns.append(arr[0])
                            cos.append(arr[1])
                        per_layer.append(jnp.stack(uns + cos, axis=0))
                    return per_layer

                return (stack(0), stack(1))

            weights = {"w_l": w_l, "w_r": w_r, "lambda_self": lambda_self}
            lat, _ = denoise_view(None, midxs, "dense", cache_per_step=cache_fn,
                                  weights=weights, batch_names=mnames)
            dec = decode(lat)
            for j, vi in enumerate(midxs):
                refined[vi] = dec[j]

    return jnp.stack(refined, axis=0)


def crop_and_downsample(images):
    """[N, 1024, 1024, 3] -> [N, 415, 290, 3] stage-3 targets (crop
    [60:890, 220:800] then x0.5 bilinear; reference: refine.py:309-315)."""
    c = images[:, CROP_Y[0] : CROP_Y[1], CROP_X[0] : CROP_X[1], :]
    n, h, w, _ = c.shape
    return jax.image.resize(c, (n, h // 2, w // 2, 3), "linear")
