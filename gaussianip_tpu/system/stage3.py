"""Stage-3 reconstruction: fit the avatar to the VCR-refined views.

Behavioral rebuild of the reference's stage-3 branch (reference:
threestudio/systems/GaussianIP.py:424-443 training_step else-branch,
:477-506 stage-3 densify): each step renders `refine_train_bs` random views
of the 32-view orbit at 1024^2, crops [60:890, 220:800], downsamples x0.5,
and minimizes 10 * L1 + 15 * LPIPS against the refined targets; one
densify_and_prune fires at global step 2500 (min_opacity 0.05). (The
reference's stage-3 prune_only condition contains a precedence bug —
`step + 2400 % 300 == 0` — so it never fires; we match the effective
behavior and simply omit it.)

The xyz LR schedule continues from global step refine_start_step + step
(reference: GaussianIP.py:425).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..data.cameras import camera_from_c2w
from ..data.sampler import CameraBatch
from ..model.adam import AdamHyper, adam_step, init_adam
from ..model.densify import add_stats, densify_and_prune, init_stats
from ..system.refine import CROP_X, CROP_Y
from .stage1 import TrainState, init_train_state


@struct.dataclass
class Stage3Config:
    height: int = struct.field(pytree_node=False, default=1024)
    width: int = struct.field(pytree_node=False, default=1024)
    refine_start_step: int = struct.field(pytree_node=False, default=2400)
    max_steps: int = struct.field(pytree_node=False, default=800)
    train_bs: int = struct.field(pytree_node=False, default=4)
    lambda_l1: float = 10.0
    lambda_lpips: float = 15.0
    densify_at_global_step: int = struct.field(pytree_node=False, default=2500)
    max_grad: float = 2e-4
    densify_min_opacity: float = 0.05
    densify_world_size_threshold: float = 0.015
    cameras_extent: float = 4.0
    bg_white: bool = struct.field(pytree_node=False, default=False)
    # crop window in pixels at (height, width); defaults are the reference's
    # 1024^2 constants (refine.py:311)
    crop_y: tuple = struct.field(pytree_node=False, default=CROP_Y)
    crop_x: tuple = struct.field(pytree_node=False, default=CROP_X)


def make_stage3_step(
    cfg: Stage3Config,
    render_cfg,
    adam_hyper: AdamHyper,
    orbit: CameraBatch,  # the 32-view refine orbit
    refined_targets,  # [32, Ht, Wt, 3] cropped+downsampled refined views
    lpips_fn: Optional[Callable] = None,  # (x, y) -> [B] distances
    mesh=None,
):
    from ..render.render import render

    bg = jnp.ones(3) if cfg.bg_white else jnp.zeros(3)
    n_views = refined_targets.shape[0]
    h, w = cfg.height, cfg.width

    def shard_view(x):
        """Constrain batch axis 0 over the 'data' mesh axis (gaussian params
        replicate; XLA psums the parameter grads — same layout as stage 1)."""
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        def constrain(a):
            spec = P(*(("data",) + (None,) * (a.ndim - 1)))
            return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(constrain, x)

    def step_fn(ts: TrainState, key):
        k_ids, _ = jax.random.split(key)
        ids = jax.random.choice(k_ids, n_views, (cfg.train_bs,), replace=False)
        c2w = orbit.c2w[ids]
        fovy = orbit.fovy[ids]
        cams = shard_view(
            jax.vmap(lambda m, f: camera_from_c2w(m, f, h, w))(c2w, fovy))
        tgt = shard_view(refined_targets[ids])

        n = ts.gaussians.capacity
        b = cfg.train_bs

        def loss_fn(g, offset):
            out = render(g, cams, bg, render_cfg, mean2d_offset=offset)
            cy, cx = cfg.crop_y, cfg.crop_x
            crop = out.rgb[:, cy[0] : cy[1], cx[0] : cx[1], :]
            th, tw = tgt.shape[1], tgt.shape[2]
            small = jax.image.resize(crop, (b, th, tw, 3), "linear")
            l1 = jnp.mean(jnp.abs(small - tgt))
            loss = cfg.lambda_l1 * l1
            lp = jnp.float32(0.0)
            if lpips_fn is not None:
                lp = jnp.mean(lpips_fn(small, tgt))
                loss = loss + cfg.lambda_lpips * lp
            return loss, {"radii": out.radii, "l1": l1, "lpips": lp}

        offset = shard_view(jnp.zeros((b, n, 2)))
        (loss, aux), (g_state, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True, allow_int=True
        )(ts.gaussians, offset)

        radii = jnp.max(aux["radii"], axis=0)
        vis = jnp.any(aux["radii"] > 0, axis=0)
        stats = add_stats(ts.stats, jnp.sum(g_off, axis=0), radii, vis)

        grads = {
            f: getattr(g_state, f)
            for f in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")
        }
        # LR schedule continues from the global step
        new_g, new_opt = adam_step(
            ts.gaussians, grads, ts.opt, adam_hyper,
            ts.step + cfg.refine_start_step,
        )
        metrics = {"loss": loss, "l1": aux["l1"], "lpips": aux["lpips"],
                   "n_active": new_g.n_active}
        return TrainState(new_g, new_opt, stats, ts.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def train_stage3(
    ts: TrainState,
    cfg: Stage3Config,
    render_cfg,
    adam_hyper: AdamHyper,
    orbit: CameraBatch,
    refined_targets,
    key,
    lpips_fn=None,
    n_steps: Optional[int] = None,
    log_every: int = 100,
    log_fn=None,
    scan_chunk: int = 25,  # steps per device dispatch (large chunks at
    #                        1024^2 have faulted the device runtime)
    mesh=None,
):
    if mesh is not None:
        assert cfg.train_bs % mesh.devices.size == 0, (
            f"stage-3 view batch {cfg.train_bs} must divide over the "
            f"{mesh.devices.size}-device data mesh")
    step_fn = make_stage3_step(cfg, render_cfg, adam_hyper, orbit,
                               refined_targets, lpips_fn, mesh=mesh)

    @jax.jit
    def densify(ts: TrainState, key):
        g, opt, stats, dropped = densify_and_prune(
            ts.gaussians, ts.opt, ts.stats, key,
            max_grad=cfg.max_grad,
            min_opacity=cfg.densify_min_opacity,
            extent=cfg.cameras_extent,
            max_world_size=cfg.densify_world_size_threshold,
        )
        return TrainState(g, opt, stats, ts.step), dropped

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(ts, keys):
        """Scan a block of steps in ONE dispatch: per-step host dispatch
        through the device tunnel costs more than the step itself."""
        def body(ts, k):
            ts, m = step_fn(ts, k)
            return ts, None

        ts, _ = jax.lax.scan(body, ts, keys)
        return ts

    n_steps = cfg.max_steps if n_steps is None else n_steps
    start = int(ts.step)
    end = start + n_steps
    densify_i = cfg.densify_at_global_step - cfg.refine_start_step
    i = start
    while i < end:
        if log_fn is not None and i % log_every == 0:
            # boundary step runs singly so its metrics can be logged
            key, k = jax.random.split(key)
            ts, metrics = step_fn(ts, k)
            log_fn(i, jax.device_get(metrics))
            i += 1
        else:
            stop = (((i // log_every) + 1) * log_every
                    if log_fn is not None else end)
            stop = min(end, stop, i + scan_chunk)
            if i < densify_i + 1 <= stop:
                stop = densify_i + 1
            keys = jax.random.split(key, stop - i + 1)
            key = keys[0]
            if stop - i == 1:
                ts, _ = step_fn(ts, keys[1])
            else:
                ts = run_chunk(ts, keys[1:])
            i = stop
        if i == densify_i + 1:
            key, k = jax.random.split(key)
            ts, _ = densify(ts, k)
    return ts
