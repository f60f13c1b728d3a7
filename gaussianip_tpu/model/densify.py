"""Densification / pruning as pure functional transforms over padded arrays.

TPU-first redesign of the reference's in-place "optimizer surgery"
(reference: gaussiansplatting/scene/gaussian_model.py:281-422): instead of
concatenating/prune-slicing torch parameter tensors and mutating Adam state
dicts, every operation is a static-shape masked compaction into the fixed
capacity buffer, jointly over (params, Adam moments, densify stats).

Semantics replicated exactly:
  * stats accumulation (gaussian_model.py:420-422): per-visible-gaussian
    ||viewspace grad||, denom += 1; max_radii2D running max
    (GaussianIP.py:452-457);
  * clone (gaussian_model.py:382-393): grad >= threshold AND max scale <=
    percent_dense * extent -> duplicate as-is;
  * split (gaussian_model.py:357-380): grad >= threshold AND max scale >
    percent_dense * extent -> 2 children sampled N(mean, scale) rotated, with
    scale/(0.8*2); original removed; freshly appended clones are never split
    (the reference's padded_grad trick) — here clones are appended after the
    originals so the same holds by construction;
  * post-densify prune (gaussian_model.py:395-410): opacity < min_opacity,
    world size > threshold. The reference's screen-size branch compares
    max_radii2D that densification_postfix just zeroed, so it never fires —
    we reproduce that (no screen-size prune inside densify);
  * prune_only (gaussian_model.py:413-418): opacity/world-size prune with no
    stat reset;
  * Adam moments: survivors keep m/v, new entries start at zero
    (cat_tensors_to_optimizer / _prune_optimizer semantics);
  * stats are zeroed by densify (densification_postfix) and kept by
    prune_only.

Output order is [kept originals, clones, split children], matching the
reference's concatenation order after its final prune.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.transforms import quat_to_rotmat
from .adam import PARAM_FIELDS, AdamState
from .gaussians import GaussianState, PAD_OPACITY, PAD_XYZ


@struct.dataclass
class DensifyStats:
    xyz_grad_accum: jnp.ndarray  # [CAP]
    denom: jnp.ndarray  # [CAP]
    max_radii2d: jnp.ndarray  # [CAP] float


def init_stats(capacity: int) -> DensifyStats:
    # three distinct buffers: aliased leaves break jit donation
    return DensifyStats(
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
    )


def add_stats(stats: DensifyStats, viewspace_grad, radii, visibility):
    """viewspace_grad: [CAP, 2] summed over the camera batch (NDC units);
    radii: [CAP] max over cameras; visibility: [CAP] bool."""
    gnorm = jnp.linalg.norm(viewspace_grad, axis=-1)
    vis = visibility.astype(jnp.float32)
    return DensifyStats(
        xyz_grad_accum=stats.xyz_grad_accum + gnorm * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.where(
            visibility, jnp.maximum(stats.max_radii2d, radii.astype(jnp.float32)),
            stats.max_radii2d,
        ),
    )


def _fresh_param_buffers(state: GaussianState):
    cap = state.capacity
    return {
        "xyz": jnp.full((cap, 3), PAD_XYZ, jnp.float32),
        "f_dc": jnp.zeros_like(state.f_dc),
        "f_rest": jnp.zeros_like(state.f_rest),
        "opacity": jnp.full((cap, 1), PAD_OPACITY, jnp.float32),
        "scaling": jnp.full((cap, 3), -10.0, jnp.float32),
        "rotation": jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (cap, 1)),
    }


def _scatter_group(dst: dict, src: dict, dest_idx, keep, cap):
    safe = jnp.where(keep, dest_idx, cap)
    out = {}
    for f, buf in dst.items():
        out[f] = buf.at[safe].set(src[f], mode="drop")
    return out


def densify_and_prune(
    state: GaussianState,
    opt: AdamState,
    stats: DensifyStats,
    key,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_world_size: float,
    percent_dense: float = 0.01,
):
    """Clone + split + prune. Returns (state, opt, stats, n_dropped)."""
    cap = state.capacity
    active = state.active_mask()
    denom_safe = jnp.maximum(stats.denom, 1e-12)
    grads = jnp.where(stats.denom > 0, stats.xyz_grad_accum / denom_safe, 0.0)
    grads = jnp.nan_to_num(grads)

    scales = state.get_scaling()
    max_scale = jnp.max(scales, axis=1)
    hot = active & (grads >= max_grad)
    small = max_scale <= percent_dense * extent
    clone_mask = hot & small
    split_mask = hot & ~small

    opac = state.get_opacity()[:, 0]
    # prune by this entry's own values (clones/children inherit opacity, so
    # the per-original decision transfers; children use their own scale)
    prune_vals = (opac < min_opacity) | (max_scale > max_world_size)
    child_scales = scales / (0.8 * 2.0)
    child_prune = (opac < min_opacity) | (
        jnp.max(child_scales, axis=1) > max_world_size
    )

    o_keep = active & ~split_mask & ~prune_vals
    c_keep = clone_mask & ~prune_vals
    s_keep = split_mask & ~child_prune

    n_o = jnp.sum(o_keep.astype(jnp.int32))
    n_c = jnp.sum(c_keep.astype(jnp.int32))
    n_s = jnp.sum(s_keep.astype(jnp.int32))
    n_new = n_o + n_c + 2 * n_s

    pos_o = jnp.cumsum(o_keep.astype(jnp.int32)) - 1
    pos_c = n_o + jnp.cumsum(c_keep.astype(jnp.int32)) - 1
    base_s = n_o + n_c + 2 * (jnp.cumsum(s_keep.astype(jnp.int32)) - 1)

    params = {f: getattr(state, f) for f in PARAM_FIELDS}

    # split children: xyz = mean + R @ (scale * normal), scale shrunk
    noise = jax.random.normal(key, (2, cap, 3), jnp.float32) * scales[None]
    R = quat_to_rotmat(state.rotation)  # [CAP, 3, 3]
    child_xyz = state.xyz[None] + jnp.einsum("nij,cnj->cni", R, noise)
    child_params = [
        {**params, "xyz": child_xyz[c], "scaling": jnp.log(child_scales)}
        for c in range(2)
    ]

    new_params = _fresh_param_buffers(state)
    new_params = _scatter_group(new_params, params, pos_o, o_keep, cap)
    new_params = _scatter_group(new_params, params, pos_c, c_keep, cap)
    new_params = _scatter_group(new_params, child_params[0], base_s, s_keep, cap)
    new_params = _scatter_group(new_params, child_params[1], base_s + 1, s_keep, cap)

    # Adam moments: originals and clones keep nothing new... survivors keep
    # theirs; clones and children start at zero (reference semantics)
    new_m = {f: jnp.zeros_like(opt.m[f]) for f in PARAM_FIELDS}
    new_v = {f: jnp.zeros_like(opt.v[f]) for f in PARAM_FIELDS}
    new_m = _scatter_group(new_m, opt.m, pos_o, o_keep, cap)
    new_v = _scatter_group(new_v, opt.v, pos_o, o_keep, cap)

    n_dropped = jnp.maximum(n_new - cap, 0)
    n_active = jnp.minimum(n_new, cap)

    new_state = state.replace(n_active=n_active.astype(jnp.int32), **new_params)
    new_opt = AdamState(m=new_m, v=new_v, count=opt.count)
    return new_state, new_opt, init_stats(cap), n_dropped


def prune_only(
    state: GaussianState,
    opt: AdamState,
    stats: DensifyStats,
    min_opacity: float,
    max_world_size: float,
):
    """Opacity/world-size prune, keeping stats (reference:
    gaussian_model.py:413-418)."""
    cap = state.capacity
    active = state.active_mask()
    opac = state.get_opacity()[:, 0]
    max_scale = jnp.max(state.get_scaling(), axis=1)
    keep = active & ~((opac < min_opacity) | (max_scale > max_world_size))
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_new = jnp.sum(keep.astype(jnp.int32))

    params = {f: getattr(state, f) for f in PARAM_FIELDS}
    new_params = _scatter_group(_fresh_param_buffers(state), params, pos, keep, cap)
    new_m = _scatter_group(
        {f: jnp.zeros_like(opt.m[f]) for f in PARAM_FIELDS}, opt.m, pos, keep, cap
    )
    new_v = _scatter_group(
        {f: jnp.zeros_like(opt.v[f]) for f in PARAM_FIELDS}, opt.v, pos, keep, cap
    )
    z = jnp.zeros_like(stats.xyz_grad_accum)
    new_stats = DensifyStats(
        xyz_grad_accum=z.at[jnp.where(keep, pos, cap)].set(
            stats.xyz_grad_accum, mode="drop"
        ),
        denom=z.at[jnp.where(keep, pos, cap)].set(stats.denom, mode="drop"),
        max_radii2d=z.at[jnp.where(keep, pos, cap)].set(
            stats.max_radii2d, mode="drop"
        ),
    )
    new_state = state.replace(n_active=n_new.astype(jnp.int32), **new_params)
    return new_state, AdamState(m=new_m, v=new_v, count=opt.count), new_stats


def reset_opacity(state: GaussianState, opt: AdamState, ceiling: float = 0.01):
    """Clamp opacities to <= ceiling and zero the opacity Adam moments
    (reference: gaussian_model.py:218-221 reset_opacity +
    replace_tensor_to_optimizer's moment reset). Used by the vanilla-3DGS
    photo-reconstruction trainer's periodic opacity reset."""
    from ..ops.transforms import inverse_sigmoid

    op = jnp.minimum(state.get_opacity(), ceiling)
    new_logit = inverse_sigmoid(jnp.clip(op, 1e-6, 1 - 1e-6))
    new_logit = jnp.where(state.active_mask()[:, None], new_logit,
                          state.opacity)
    new_m = dict(opt.m)
    new_v = dict(opt.v)
    new_m["opacity"] = jnp.zeros_like(opt.m["opacity"])
    new_v["opacity"] = jnp.zeros_like(opt.v["opacity"])
    return (state.replace(opacity=new_logit),
            AdamState(m=new_m, v=new_v, count=opt.count))
