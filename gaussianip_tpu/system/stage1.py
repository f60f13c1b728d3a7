"""Stage-1 AHDS trainer: the jitted training step + host-side schedule loop.

Functional rebuild of the reference system's stage-1 path (reference:
threestudio/systems/GaussianIP.py:362-506 training_step /
on_before_optimizer_step). TPU-first differences:

  * ONE jitted step fuses camera sampling, batched rendering, pose-map
    rasterization, guidance loss, regularizers, backward, viewspace-grad
    stats and the Adam update (the reference loops cameras in Python, draws
    pose maps with cv2 on host, and syncs every camera);
  * densify/prune run as separate jitted transforms at schedule boundaries
    (reference: GaussianIP.py:449-475), keeping the hot step's shapes static;
  * guidance is a pluggable differentiable fn (stub for smoke tests, the
    AHDS diffusion stack for the real recipe).

Losses (reference: GaussianIP.py:376-395): loss_sds * lambda_sds
+ sqrt(norm_depth^2 + 0.01).mean() * lambda_sparsity
+ bce(norm_depth, norm_depth) * lambda_opaque, where norm_depth is the
depth-normalized proxy the reference calls "opacity" (GaussianIP.py:225).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..data.cameras import camera_from_c2w
from ..data.sampler import CameraSamplerConfig, sample_train_batch
from ..human.posemap import openpose_draw
from ..model.adam import AdamHyper, AdamState, adam_step, init_adam
from ..model.densify import (
    DensifyStats,
    add_stats,
    densify_and_prune,
    init_stats,
    prune_only,
)
from ..model.gaussians import GaussianState
from ..render.render import RenderConfig, render


@struct.dataclass
class Stage1Config:
    render_height: int = struct.field(pytree_node=False, default=512)
    render_width: int = struct.field(pytree_node=False, default=512)
    head_offset: float = struct.field(pytree_node=False, default=0.65)
    bg_white: bool = struct.field(pytree_node=False, default=False)
    lambda_sds: float = 1.0
    lambda_sparsity: float = 1.0
    lambda_opaque: float = 0.0
    # densify & prune (reference: configs/exp.yaml:70-75,163-168)
    densify_prune_start_step: int = struct.field(pytree_node=False, default=200)
    densify_prune_end_step: int = struct.field(pytree_node=False, default=1700)
    densify_prune_interval: int = struct.field(pytree_node=False, default=500)
    densify_prune_min_opacity: float = 0.04
    densify_prune_world_size_threshold: float = 0.015
    prune_only_start_step: int = struct.field(pytree_node=False, default=1700)
    prune_only_end_step: int = struct.field(pytree_node=False, default=1900)
    prune_only_interval: int = struct.field(pytree_node=False, default=300)
    prune_opacity_threshold: float = 0.04
    prune_world_size_threshold: float = 0.015
    max_grad: float = 2e-4
    cameras_extent: float = 4.0
    max_steps: int = struct.field(pytree_node=False, default=2400)
    # exclude gaussians near the hands from densification stats
    # (reference: GaussianIP.py:214-219)
    disable_hand_densification: bool = struct.field(
        pytree_node=False, default=False)
    hand_radius: float = 0.05


class TrainState(NamedTuple):
    gaussians: GaussianState
    opt: AdamState
    stats: DensifyStats
    step: jnp.ndarray  # int32


def init_train_state(gaussians: GaussianState) -> TrainState:
    return TrainState(
        gaussians=gaussians,
        opt=init_adam(gaussians),
        stats=init_stats(gaussians.capacity),
        step=jnp.int32(0),
    )


def make_train_step(
    cfg: Stage1Config,
    cam_cfg: CameraSamplerConfig,
    render_cfg: RenderConfig,
    adam_hyper: AdamHyper,
    guidance: Callable,
    skel_points3d,
    mesh=None,
    hand_centers=None,  # [2, 3] wrist keypoints (disable_hand_densification)
    thread_key: bool = False,  # step returns (ts, metrics, next_key); the
    #                            host loop threads keys with no eager splits
):
    """Build the jitted stage-1 step. `guidance(step, key, rgb, control, aux)
    -> {'loss_sds': scalar, ...}` must be differentiable in rgb.
    skel_points3d: [18, 3] world keypoints (host constant per avatar).
    mesh: optional jax.sharding.Mesh with a 'data' axis — gaussian params
    stay replicated, the per-view render/guidance work shards over the camera
    batch, and XLA inserts the psum on the parameter grads (the TPU-native
    equivalent of the reference's absent DDP, SURVEY.md §2.4).
    """
    h, w = cfg.render_height, cfg.render_width
    bg = jnp.ones(3) if cfg.bg_white else jnp.zeros(3)
    points3d = jnp.asarray(skel_points3d)

    def shard_view(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        def constrain(a):
            spec = P(*(("data",) + (None,) * (a.ndim - 1)))
            return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(constrain, x)

    def step_fn(ts: TrainState, key, gp):
        # guidance params ride as a jit ARGUMENT (gp): closed-over multi-GB
        # weights would be baked into the lowered graph as constants and
        # stall the compiler (NOTES gotcha #2)
        g_call = guidance if gp is None else guidance.with_params(gp)
        k_cam, k_guid = jax.random.split(key)
        batch = sample_train_batch(cam_cfg, k_cam, ts.step)
        batch = shard_view(batch)
        cams = jax.vmap(
            lambda c2w, fv: camera_from_c2w(c2w, fv, h, w)
        )(batch.c2w, batch.fovy)

        head_zoom = (batch.center_z == cfg.head_offset) & (batch.azimuth_deg > 0)
        pose_images, all_vis, _ = jax.vmap(
            lambda mvp, az, hz: openpose_draw(points3d, mvp, az, hz, h, w)
        )(batch.mvp_mtx, batch.azimuth_deg, head_zoom)

        n = ts.gaussians.capacity
        b = batch.c2w.shape[0]

        def loss_fn(g: GaussianState, offset):
            out = render(g, cams, bg, render_cfg, mean2d_offset=offset)
            gout = g_call(
                ts.step, k_guid, out.rgb, pose_images,
                {
                    "all_vis": all_vis,
                    "elevation": batch.elevation_deg,
                    "azimuth": batch.azimuth_deg,
                    "center": batch.center_z,
                    "camera_distances": batch.camera_distances,
                },
            )
            loss = gout["loss_sds"] * cfg.lambda_sds
            norm_depth = out.depth / (jnp.max(out.depth) + 1e-5)
            loss_sparsity = jnp.mean(jnp.sqrt(norm_depth ** 2 + 0.01))
            loss = loss + loss_sparsity * cfg.lambda_sparsity
            nd = jnp.clip(norm_depth, 1e-3, 1 - 1e-3)
            loss_opaque = -jnp.mean(nd * jnp.log(nd) + (1 - nd) * jnp.log(1 - nd))
            loss = loss + loss_opaque * cfg.lambda_opaque
            aux = {
                "radii": out.radii,
                "loss_sds": gout["loss_sds"],
                "loss_sparsity": loss_sparsity,
                "n_dropped": out.n_dropped,
            }
            return loss, aux

        offset = jnp.zeros((b, n, 2))
        (loss, aux), (g_state, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True, allow_int=True
        )(ts.gaussians, offset)

        # densification statistics (reference: GaussianIP.py:450-457)
        radii = jnp.max(aux["radii"], axis=0)
        visibility = jnp.any(aux["radii"] > 0, axis=0)
        if cfg.disable_hand_densification and hand_centers is not None:
            hc = jnp.asarray(hand_centers)
            dist = jnp.linalg.norm(
                ts.gaussians.xyz[:, None, :] - hc[None, :, :], axis=-1)
            visibility = visibility & ~(jnp.min(dist, axis=-1) < cfg.hand_radius)
        stats = add_stats(ts.stats, jnp.sum(g_off, axis=0), radii, visibility)

        grads = {
            f: getattr(g_state, f)
            for f in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")
        }
        new_g, new_opt = adam_step(ts.gaussians, grads, ts.opt, adam_hyper, ts.step)
        metrics = {
            "loss": loss,
            "loss_sds": aux["loss_sds"],
            "loss_sparsity": aux["loss_sparsity"],
            "n_active": new_g.n_active,
            "n_dropped_instances": jnp.max(aux["n_dropped"]),
        }
        return TrainState(new_g, new_opt, stats, ts.step + 1), metrics

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    gp0 = getattr(guidance, "jit_params", None)

    if thread_key:
        # fold the host loop's per-step `key, k = split(key)` INTO the jit
        # (the eager split is one device round-trip per step — ~25-38 ms
        # each through the axon tunnel, 60-90 s over the 2400-step stage).
        # Same split order as the host loop: bit-identical key sequence.
        def step_thread(ts, key, gp):
            key_next, k = jax.random.split(key)
            new_ts, metrics = step_fn(ts, k, gp)
            return new_ts, metrics, key_next

        jitted_t = jax.jit(step_thread, donate_argnums=(0,))

        def call(ts, key):
            return jitted_t(ts, key, gp0)

        return call

    def call(ts, key):
        return jitted(ts, key, gp0)

    return call


def make_densify_fns(cfg: Stage1Config):
    """Jitted densify/prune transforms applied at schedule boundaries."""

    @jax.jit
    def densify(ts: TrainState, key):
        g, opt, stats, dropped = densify_and_prune(
            ts.gaussians, ts.opt, ts.stats, key,
            max_grad=cfg.max_grad,
            min_opacity=cfg.densify_prune_min_opacity,
            extent=cfg.cameras_extent,
            max_world_size=cfg.densify_prune_world_size_threshold,
        )
        return TrainState(g, opt, stats, ts.step), dropped

    @jax.jit
    def prune(ts: TrainState):
        g, opt, stats = prune_only(
            ts.gaussians, ts.opt, ts.stats,
            cfg.prune_opacity_threshold, cfg.prune_world_size_threshold,
        )
        return TrainState(g, opt, stats, ts.step)

    return densify, prune


def densify_due(cfg: Stage1Config, step: int) -> bool:
    """reference: GaussianIP.py:461-463."""
    return (
        step > cfg.densify_prune_start_step
        and step < cfg.densify_prune_end_step
        and step % cfg.densify_prune_interval == 0
    )


def prune_due(cfg: Stage1Config, step: int) -> bool:
    """reference: GaussianIP.py:466-475."""
    return (
        step > cfg.prune_only_start_step
        and step < cfg.prune_only_end_step
        and step % cfg.prune_only_interval == 0
    )


def train_stage1(
    ts: TrainState,
    cfg: Stage1Config,
    cam_cfg: CameraSamplerConfig,
    render_cfg: RenderConfig,
    adam_hyper: AdamHyper,
    guidance: Callable,
    skel_points3d,
    key,
    n_steps: int | None = None,
    log_every: int = 100,
    log_fn: Callable[[int, dict], None] | None = None,
    val_every: int = 0,
    val_fn: Callable[[int, "TrainState"], None] | None = None,
    mesh=None,
    hand_centers=None,
    ckpt_every: int = 0,
    ckpt_fn: Callable[[int, "TrainState"], None] | None = None,
):
    """Host schedule loop for stage 1 (validation renders every
    `val_every` steps, reference: configs/exp.yaml:194 + GaussianIP.py:509).

    mesh: optional 1-D 'data' jax.sharding.Mesh — the camera batch shards
    over it (cam_cfg.batch_size must divide by the mesh size)."""
    if mesh is not None:
        assert cam_cfg.batch_size % mesh.devices.size == 0, (
            f"camera batch {cam_cfg.batch_size} must divide over the "
            f"{mesh.devices.size}-device data mesh")
    step_fn = make_train_step(
        cfg, cam_cfg, render_cfg, adam_hyper, guidance, skel_points3d,
        mesh=mesh, hand_centers=hand_centers, thread_key=True,
    )
    densify, prune = make_densify_fns(cfg)
    n_steps = cfg.max_steps if n_steps is None else n_steps
    start = int(ts.step)
    if start > 0:
        # resumed run: advance the key stream so replayed steps don't reuse
        # the original run's randomness
        key = jax.random.fold_in(key, start)
    for i in range(start, start + n_steps):
        ts, metrics, key = step_fn(ts, key)
        if densify_due(cfg, i):
            key, k = jax.random.split(key)
            ts, _ = densify(ts, k)
        elif prune_due(cfg, i):
            ts = prune(ts)
        if log_fn is not None and i % log_every == 0:
            log_fn(i, jax.device_get(metrics))
        if val_fn is not None and val_every and i % val_every == 0 and i > 0:
            val_fn(i, ts)
        if (ckpt_fn is not None and ckpt_every and i > start
                and i % ckpt_every == 0):
            ckpt_fn(i, ts)
    return ts
