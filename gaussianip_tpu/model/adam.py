"""Per-group Adam for the gaussian parameters, as a pure functional transform.

Mirrors the reference's optimizer setup (reference:
gaussiansplatting/scene/gaussian_model.py:138-173 and the load-bearing
defaults of gaussiansplatting/arguments/__init__.py:70-87):
  xyz       position_lr_init * spatial_lr_scale, exp-decayed to _final
  f_dc      feature_lr
  f_rest    feature_lr / 20
  opacity   opacity_lr
  scaling   scaling_lr
  rotation  rotation_lr
with torch-Adam semantics (betas (0.9, 0.999), eps=1e-15 added after sqrt,
bias correction) — eps matches the reference's Adam(eps=1e-15).

Because the state is padded, inactive rows have zero gradients and zero
moments, so their updates are exact no-ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.transforms import expon_lr

PARAM_FIELDS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


@struct.dataclass
class AdamHyper:
    position_lr_init: float = 5e-5
    position_lr_final: float = 2.5e-5
    position_lr_delay_mult: float = 0.5
    position_lr_max_steps: int = struct.field(pytree_node=False, default=30_000)
    feature_lr: float = 0.0125
    opacity_lr: float = 0.01
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    spatial_lr_scale: float = 4.0  # cameras_extent (reference: GaussianIP.py:134)
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15
    percent_dense: float = 0.01


@struct.dataclass
class AdamState:
    m: dict
    v: dict
    count: jnp.ndarray  # int32, number of applied steps


def init_adam(state) -> AdamState:
    zeros = {f: jnp.zeros_like(getattr(state, f)) for f in PARAM_FIELDS}
    return AdamState(
        m=zeros, v={f: jnp.zeros_like(z) for f, z in zeros.items()},
        count=jnp.int32(0),
    )


def field_lrs(hyper: AdamHyper, step):
    """Learning rate per field at `step` (xyz exp-decayed, reference:
    gaussian_model.py:156-166)."""
    xyz_lr = expon_lr(
        step,
        hyper.position_lr_init * hyper.spatial_lr_scale,
        hyper.position_lr_final * hyper.spatial_lr_scale,
        lr_delay_steps=0,
        lr_delay_mult=hyper.position_lr_delay_mult,
        max_steps=hyper.position_lr_max_steps,
    )
    return {
        "xyz": xyz_lr,
        "f_dc": hyper.feature_lr,
        "f_rest": hyper.feature_lr / 20.0,
        "opacity": hyper.opacity_lr,
        "scaling": hyper.scaling_lr,
        "rotation": hyper.rotation_lr,
    }


def adam_step(state, grads: dict, opt: AdamState, hyper: AdamHyper, step):
    """One optimizer step. `grads` maps field name -> gradient array; `step`
    drives the xyz schedule (the reference passes true_global_step, which can
    differ from the Adam step count across stages)."""
    lrs = field_lrs(hyper, step)
    t = (opt.count + 1).astype(jnp.float32)
    bc1 = 1.0 - hyper.beta1 ** t
    bc2 = 1.0 - hyper.beta2 ** t
    new_m, new_v, upd = {}, {}, {}
    for f in PARAM_FIELDS:
        g = grads[f]
        m = hyper.beta1 * opt.m[f] + (1 - hyper.beta1) * g
        v = hyper.beta2 * opt.v[f] + (1 - hyper.beta2) * g * g
        mh = m / bc1
        vh = v / bc2
        upd[f] = getattr(state, f) - lrs[f] * mh / (jnp.sqrt(vh) + hyper.eps)
        new_m[f] = m
        new_v[f] = v
    return (
        state.replace(**upd),
        AdamState(m=new_m, v=new_v, count=opt.count + 1),
    )
