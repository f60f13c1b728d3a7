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

from typing import Dict, NamedTuple, Optional

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

    def step(unet_params, controlnet_params, latents, t, t_prev, context,
             control, vcr_mode, vcr_cache, vcr_weights, vcr_idx, view_idx):
        # view_idx set -> `latents` is the FULL 32-view latent stack; the
        # view-batch gather and the writeback scatter live inside the jit
        # (two fewer eager device ops per phase through the tunnel)
        full_lat = latents
        if view_idx is not None:
            latents = jnp.take(full_lat, view_idx, axis=0)
        # params ride as ARGUMENTS: closed-over multi-GB weights get baked
        # into the lowered graph as constants (NOTES gotcha #2)
        # vcr_idx set -> vcr_cache holds the RAW stored caches and the
        # per-layer source rows are gathered HERE, inside the jit. The old
        # eager path (stack_srcs outside jit) issued ~2 x n_layers x 13
        # device ops per denoise step; through the axon tunnel's ~25 ms
        # RPC floor that dominated stage-2 wall-clock.
        if vcr_idx is not None and vcr_mode == "key":
            (cache_a,) = vcr_cache
            vcr_cache = [jnp.take(c, vcr_idx[0], axis=0) for c in cache_a]
        elif vcr_idx is not None and vcr_mode == "dense":
            if len(vcr_cache) == 2:  # (cache_a, cache_k): combine here
                cache_a, cache_k = vcr_cache
                comb = [jnp.concatenate([a, k], axis=0)
                        for a, k in zip(cache_a, cache_k)]
            else:  # (comb,): pre-combined once per step by the caller
                (comb,) = vcr_cache
            vcr_cache = (
                [jnp.take(c, vcr_idx[0], axis=0) for c in comb],
                [jnp.take(c, vcr_idx[1], axis=0) for c in comb],
            )
        lat_in = _shard(jnp.concatenate([latents] * 2, axis=0))
        t_in = jnp.full((lat_in.shape[0],), t, jnp.int32)
        ctrl_in = _shard(jnp.concatenate([control] * 2, axis=0))
        context = _shard(context)
        vcr_cache = _shard(vcr_cache)
        down_res, mid = models.controlnet.apply(
            controlnet_params, lat_in, t_in, context, ctrl_in,
            conditioning_scale=1.0,
        )
        eps, cache = models.unet.apply(
            unet_params, lat_in, t_in, context,
            down_block_residuals=down_res, mid_block_residual=mid,
            ip_scale=ip_scale, vcr_mode=vcr_mode, vcr_cache=vcr_cache,
            vcr_weights=vcr_weights,
        )
        eps = _cfg_eps(eps, guidance_scale)
        new_latents = ddim_step(ddim, eps, jnp.full((latents.shape[0],), t),
                                jnp.full((latents.shape[0],), t_prev), latents)
        if view_idx is not None:
            return full_lat.at[view_idx].set(new_latents), cache
        return new_latents, cache

    jitted = {}

    def run(latents, t, t_prev, context, control, vcr_mode="off",
            vcr_cache=None, vcr_weights=None, vcr_idx=None, view_idx=None,
            analyze=False):
        key = (vcr_mode, latents.shape, vcr_idx is None, view_idx is None,
               None if view_idx is None else view_idx.shape)
        if key not in jitted:
            has_idx = vcr_idx is not None
            has_view = view_idx is not None
            jitted[key] = jax.jit(
                lambda up, cnp, l, tt, tp, cx, ct, vc, vw, vi, wi: step(
                    up, cnp, l, tt, tp, cx, ct, vcr_mode, vc, vw,
                    vi if has_idx else None, wi if has_view else None),
            )
        args = (models.unet_params, models.controlnet_params,
                latents, t, t_prev, context, control, vcr_cache,
                vcr_weights, vcr_idx, view_idx)
        if analyze:
            # compile-only HBM accounting (scripts/probe_refinemem.py):
            # returns the XLA memory analysis instead of executing
            return jitted[key].lower(*args).compile().memory_analysis()
        return jitted[key](*args)

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
    dense_batch: int = 4,  # 4 fits single-chip HBM at 1024^2; pass 8 on a mesh
    mesh=None,
):
    """Returns refined images [32, H, W, 3] in canonical view order.

    mesh: optional 1-D 'data' jax.sharding.Mesh; the dense phase (24 of 32
    views, grouped into 3 weight classes of 8) shards its view batch over
    the devices. dense_batch caps the per-call group size (memory)."""
    n_views = images.shape[0]
    assert n_views == 32, "the VCR topology is defined for 32 views"
    # cap materialized attention scores while the VCR caches are resident:
    # at the refine's CFG batch 8 the 64^2-level self-attention would
    # otherwise materialize 4.3 GB of f32 scores per layer next to ~2.6 GB
    # of caches and RESOURCE_EXHAUST the 16 GB chip (probe_refinemem:
    # phase temp 8.6 GB at the old 7e9 threshold vs 4.7 GB at 2e9). Read
    # at trace time in blocks._attend; restored on exit. A caller-set
    # GIP_ATTN_SCORE_BYTES wins (bf16 frozen params free ~2.5 GB and can
    # afford a higher budget — A/B before changing the default).
    import os as _os
    _prev_budget = _os.environ.get("GIP_ATTN_SCORE_BYTES")
    if _prev_budget is None:
        _os.environ["GIP_ATTN_SCORE_BYTES"] = "2e9"
    try:
        return _refine_views_inner(
            models, images, control_images, contexts, key, ddim, num_steps,
            num_ladder, guidance_scale, ip_scale, lambda_self, dense_batch,
            mesh)
    finally:
        if _prev_budget is None:
            _os.environ.pop("GIP_ATTN_SCORE_BYTES", None)
        else:
            _os.environ["GIP_ATTN_SCORE_BYTES"] = _prev_budget


def _refine_views_inner(
    models, images, control_images, contexts, key, ddim, num_steps,
    num_ladder, guidance_scale, ip_scale, lambda_self, dense_batch, mesh,
):
    n_views = images.shape[0]
    ddim = ddim or make_ddim_schedule()
    ladder = np.asarray(refine_timestep_ladder(num_ladder))
    steps = ladder[-num_steps:]  # descending
    t0 = int(steps[0])

    # shared noise across all views (reference: refine.py:740-741)
    k_noise, _ = jax.random.split(key)

    vae = models.vae

    # 1024^2 VAE activations are ~GB-scale per image: run 2-image batches
    # serialized INSIDE one jit via lax.map (device-side serialization
    # bounds live activations like the old per-call block_until_ready loop
    # did, without 16 host round-trips per sweep)
    vae_bs = 2

    @jax.jit
    def _encode_all(vp, img):
        n, h_, w_, c_ = img.shape
        chunks = img.reshape(n // vae_bs, vae_bs, h_, w_, c_)

        def one(ch):
            return vae.apply(vp, ch * 2.0 - 1.0, method=vae.encode)

        out = jax.lax.map(one, chunks)
        return out.reshape(n, *out.shape[2:])

    @jax.jit
    def _decode_all(vp, lat):
        n, h_, w_, c_ = lat.shape
        chunks = lat.reshape(n // vae_bs, vae_bs, h_, w_, c_)

        def one(ch):
            x = vae.apply(vp, ch, method=vae.decode)
            return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)

        out = jax.lax.map(one, chunks)
        return out.reshape(n, *out.shape[2:])

    def encode(img):
        return _encode_all(models.vae_params, img)

    def decode(lat):
        return _decode_all(models.vae_params, lat)

    latents0 = encode(images)  # [32, h, w, 4]
    noise = jax.random.normal(k_noise, latents0.shape[1:])[None]
    t_arr = jnp.full((n_views,), t0)
    lat = add_noise(ddim, latents0, jnp.broadcast_to(noise, latents0.shape),
                    t_arr)

    run_step = make_refine_step(models, ddim, guidance_scale, ip_scale,
                                mesh=mesh)
    prevs = list(steps[1:]) + [-1]

    # STEP-MAJOR schedule: all 32 views advance one denoise step together
    # (anchors batched -> keys batched -> dense groups), so only the CURRENT
    # step's mutual-attention states stay in HBM (~0.9 GB) instead of all 8
    # steps x 8 stored views (~7 GB, which does not fit beside the weights
    # on one 16 GB chip). Mathematically identical to the reference's
    # view-major loop: a view's step-si attention sources are the stored
    # views' step-si hidden states either way (reference: refine.py:161-239).
    anchor_names = ["front", "back", "left", "right"]
    key_names = ["k0", "k1", "k2", "k3"]
    anchor_idxs = [VIEW_IDX_ALL[VIEW_NAME_ALL.index(n_)] for n_ in anchor_names]
    key_idxs = [VIEW_IDX_ALL[VIEW_NAME_ALL.index(n_)] for n_ in key_names]

    def batch_ctx(names):
        un = jnp.stack([contexts[n_][0] for n_ in names])
        co = jnp.stack([contexts[n_][1] for n_ in names])
        return jnp.concatenate([un, co], axis=0)

    # source rows in the per-step caches, by name. Anchors live in cache_a
    # ([2*4, S, D]: uncond rows 0-3, cond rows 4-7), keys in cache_k (same
    # layout); the dense phase indexes the in-jit concat [cache_a; cache_k]
    # (anchor un 0-3 / co 4-7, key un 8-11 / co 12-15). The row gathers
    # happen INSIDE the jitted step (run_step vcr_idx) — no eager per-layer
    # stacking through the device tunnel.
    b_a = len(anchor_names)
    b_k = len(key_names)
    rows_a = {n_: (i, b_a + i) for i, n_ in enumerate(anchor_names)}
    rows_comb = {**rows_a}
    rows_comb.update({n_: (2 * b_a + j, 2 * b_a + b_k + j)
                      for j, n_ in enumerate(key_names)})

    def src_idx(names, table):
        un = [table[n_][0] for n_ in names]
        co = [table[n_][1] for n_ in names]
        return jnp.asarray(un + co, jnp.int32)

    ctx_a = batch_ctx(anchor_names)
    ctx_k = batch_ctx(key_names)
    ctrl_a = control_images[jnp.asarray(anchor_idxs)]
    ctrl_k = control_images[jnp.asarray(key_idxs)]

    # dense weight classes (uniform vcr weights per batch)
    groups: Dict = {}
    for n_ in [f"v{i}" for i in range(24)]:
        vi = VIEW_IDX_ALL[VIEW_NAME_ALL.index(n_)]
        w = KEY_VIEW_WEIGHT_PAIR[n_]
        groups.setdefault(w, []).append((n_, vi))
    dense_batches = []
    for (w_l, w_r), class_members in groups.items():
        for g0 in range(0, len(class_members), dense_batch):
            members = class_members[g0 : g0 + dense_batch]
            mnames = [m[0] for m in members]
            midxs = [m[1] for m in members]
            dense_batches.append((
                (w_l, w_r), mnames, midxs, batch_ctx(mnames),
                control_images[jnp.asarray(midxs)],
            ))

    idx_key = src_idx([ANCHOR_OF_KEY[n_] for n_ in key_names], rows_a)
    dense_idx = [
        (src_idx([KEY_VIEW_NAME_PAIR[n_][0] for n_ in mnames], rows_comb),
         src_idx([KEY_VIEW_NAME_PAIR[n_][1] for n_ in mnames], rows_comb))
        for (_, mnames, _, _, _) in dense_batches
    ]

    vi_a = jnp.asarray(anchor_idxs, jnp.int32)
    vi_k = jnp.asarray(key_idxs, jnp.int32)
    vi_d = [jnp.asarray(midxs, jnp.int32)
            for (_, _, midxs, _, _) in dense_batches]

    # combine the anchor+key caches ONCE per step (the dense groups would
    # otherwise each re-materialize the ~GB concat inside their own jit)
    combine = jax.jit(lambda a, k: [jnp.concatenate([x, y], axis=0)
                                    for x, y in zip(a, k)])

    for t, tp in zip(steps, prevs):
        t, tp = int(t), int(tp)
        # phase A: anchors (batched) store their attention states. Each
        # phase call takes the FULL latent stack and its view indices; the
        # gather + writeback happen inside the jit (no eager slicing)
        lat, cache_a = run_step(lat, t, tp, ctx_a, ctrl_a, vcr_mode="store",
                                view_idx=vi_a)
        # phase B: keys (batched) attend over concat(self, their anchor)
        lat, cache_k = run_step(lat, t, tp, ctx_k, ctrl_k, vcr_mode="key",
                                vcr_cache=(cache_a,), vcr_idx=(idx_key,),
                                view_idx=vi_k)
        # phase C: dense groups blend self + two key views
        comb = combine(cache_a, cache_k)
        # the separate anchor/key caches are dead once combined (~0.9 GB)
        cache_a = cache_k = None
        for gi, ((w_l, w_r), mnames, midxs, ctx_d, ctrl_d) in enumerate(
                dense_batches):
            weights = {"w_l": w_l, "w_r": w_r, "lambda_self": lambda_self}
            lat, _ = run_step(lat, t, tp, ctx_d, ctrl_d, vcr_mode="dense",
                              vcr_cache=(comb,),
                              vcr_idx=dense_idx[gi], vcr_weights=weights,
                              view_idx=vi_d[gi])
        comb = None
        # sync per step: async dispatch would otherwise keep several steps'
        # attention caches alive at once and exhaust HBM. This must be a
        # HOST READBACK: block_until_ready does NOT block through the axon
        # tunnel (NOTES gotcha #1) and the un-synced r5 run RESOURCE_
        # EXHAUSTED exactly here; a D2H fetch drains the in-order queue.
        jax.device_get(lat[0, 0, 0, 0])

    return decode(lat)


def crop_and_downsample(images):
    """[N, 1024, 1024, 3] -> [N, 415, 290, 3] stage-3 targets (crop
    [60:890, 220:800] then x0.5 bilinear; reference: refine.py:309-315)."""
    c = images[:, CROP_Y[0] : CROP_Y[1], CROP_X[0] : CROP_X[1], :]
    n, h, w, _ = c.shape
    return jax.image.resize(c, (n, h // 2, w // 2, 3), "linear")
