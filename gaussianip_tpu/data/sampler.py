"""Camera sampling: random training cameras + fixed eval orbits.

Behavioral rebuild of the reference's random-camera datamodule (reference:
threestudio/data/camera_data.py:144-661) as pure jittable JAX functions —
there is no image dataset; "data" is camera poses:

  * training batches (camera_data.py:276-477): probabilistic head/back
    zoom-in modes (shift lookat center by head_offset on +z, tighter distance
    ranges, restricted azimuth), stratified batch-uniform azimuth, uniform
    elevation/distance/fovy; c2w via +z-up look-at; threestudio projection
    (near 0.1, far 1000) and MVP for the pose maps;
  * eval orbits (camera_data.py:481-594): evenly spaced azimuth at
    eval_elevation/distance, PLUS a second head orbit (distance
    eval_camera_distance_head, center z += head_offset) concatenated after
    the body orbit (len = n_views * 2).

The sampler is a pure function of a PRNG key + step, so the whole train step
(sampling included) jits into one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.camera_math import (
    deg2rad,
    get_mvp_matrix,
    gl_projection_matrix,
    look_at_c2w,
    spherical_to_position,
)


@struct.dataclass
class CameraSamplerConfig:
    height: int = struct.field(pytree_node=False, default=1024)
    width: int = struct.field(pytree_node=False, default=1024)
    batch_size: int = struct.field(pytree_node=False, default=4)
    elevation_range: tuple = struct.field(pytree_node=False, default=(-30.0, 30.0))
    azimuth_range: tuple = struct.field(pytree_node=False, default=(-180.0, 180.0))
    camera_distance_range: tuple = struct.field(
        pytree_node=False, default=(1.3, 1.7))
    fovy_range: tuple = struct.field(pytree_node=False, default=(40.0, 70.0))
    batch_uniform_azimuth: bool = struct.field(pytree_node=False, default=True)
    # head / back zoom-in modes
    enable_near_head_poses: bool = struct.field(pytree_node=False, default=True)
    enable_near_back_poses: bool = struct.field(pytree_node=False, default=True)
    head_offset: float = struct.field(pytree_node=False, default=0.65)
    back_offset: float = struct.field(pytree_node=False, default=0.65)
    head_camera_distance_range: tuple = struct.field(
        pytree_node=False, default=(0.4, 0.6))
    back_camera_distance_range: tuple = struct.field(
        pytree_node=False, default=(0.6, 0.8))
    head_prob: float = struct.field(pytree_node=False, default=0.25)
    back_prob: float = struct.field(pytree_node=False, default=0.2)
    head_start_step: int = struct.field(pytree_node=False, default=1200)
    head_end_step: int = struct.field(pytree_node=False, default=3600)
    back_start_step: int = struct.field(pytree_node=False, default=1200)
    back_end_step: int = struct.field(pytree_node=False, default=3600)
    head_azimuth_range: tuple = struct.field(pytree_node=False, default=(0.0, 180.0))
    back_azimuth_range: tuple = struct.field(
        pytree_node=False, default=(-180.0, 0.0))
    # eval
    eval_height: int = struct.field(pytree_node=False, default=1024)
    eval_width: int = struct.field(pytree_node=False, default=1024)
    eval_elevation_deg: float = struct.field(pytree_node=False, default=5.0)
    eval_camera_distance: float = struct.field(pytree_node=False, default=1.8)
    eval_camera_distance_head: float = struct.field(pytree_node=False, default=0.6)
    eval_fovy_deg: float = struct.field(pytree_node=False, default=70.0)
    n_val_views: int = struct.field(pytree_node=False, default=8)
    n_test_views: int = struct.field(pytree_node=False, default=144)


class CameraBatch(NamedTuple):
    mvp_mtx: jnp.ndarray  # [B, 4, 4] (threestudio convention, for pose maps)
    c2w: jnp.ndarray  # [B, 4, 4]
    center_z: jnp.ndarray  # [B] 0.0 body / head_offset zoomed
    elevation_deg: jnp.ndarray  # [B]
    azimuth_deg: jnp.ndarray  # [B]
    camera_distances: jnp.ndarray  # [B]
    fovy: jnp.ndarray  # [B] radians


def _uniform(key, b, lo, hi):
    return jax.random.uniform(key, (b,), minval=lo, maxval=hi)


def sample_train_batch(cfg: CameraSamplerConfig, key, step) -> CameraBatch:
    """One random training camera batch; `step` gates the zoom-in windows
    (reference: camera_data.py:311-329)."""
    b = cfg.batch_size
    k_mode1, k_mode2, k_el, k_az, k_d, k_f = jax.random.split(key, 6)

    step = jnp.asarray(step)
    head_ok = cfg.enable_near_head_poses & True
    in_head_win = (step >= cfg.head_start_step) & (step <= cfg.head_end_step)
    in_back_win = (step >= cfg.back_start_step) & (step <= cfg.back_end_step)
    r1 = jax.random.uniform(k_mode1, ())
    r2 = jax.random.uniform(k_mode2, ())
    zoom_head = (
        jnp.asarray(cfg.enable_near_head_poses) & (r1 < cfg.head_prob) & in_head_win
    )
    zoom_back = (
        ~zoom_head
        & jnp.asarray(cfg.enable_near_back_poses)
        & (r2 < cfg.back_prob)
        & in_back_win
    )

    def pick(head_v, back_v, norm_v):
        return jnp.where(zoom_head, head_v, jnp.where(zoom_back, back_v, norm_v))

    az_lo = pick(cfg.head_azimuth_range[0], cfg.back_azimuth_range[0],
                 cfg.azimuth_range[0])
    az_hi = pick(cfg.head_azimuth_range[1], cfg.back_azimuth_range[1],
                 cfg.azimuth_range[1])
    d_lo = pick(cfg.head_camera_distance_range[0],
                cfg.back_camera_distance_range[0], cfg.camera_distance_range[0])
    d_hi = pick(cfg.head_camera_distance_range[1],
                cfg.back_camera_distance_range[1], cfg.camera_distance_range[1])

    elevation_deg = _uniform(k_el, b, *cfg.elevation_range)
    if cfg.batch_uniform_azimuth:
        u = jax.random.uniform(k_az, (b,))
        azimuth_deg = (u + jnp.arange(b)) / b * (az_hi - az_lo) + az_lo
    else:
        azimuth_deg = jax.random.uniform(k_az, (b,)) * (az_hi - az_lo) + az_lo
    distances = jax.random.uniform(k_d, (b,)) * (d_hi - d_lo) + d_lo
    fovy_deg = _uniform(k_f, b, *cfg.fovy_range)

    positions = spherical_to_position(
        deg2rad(elevation_deg), deg2rad(azimuth_deg), distances
    )
    offset = pick(cfg.head_offset, cfg.back_offset, 0.0)
    center = jnp.zeros((b, 3)).at[:, 2].add(offset)
    positions = positions.at[:, 2].add(offset)

    up = jnp.tile(jnp.array([[0.0, 0, 1]]), (b, 1))
    c2w = look_at_c2w(positions, center, up)
    fovy = deg2rad(fovy_deg)
    proj = gl_projection_matrix(fovy, cfg.width / cfg.height, 0.1, 1000.0)
    mvp = get_mvp_matrix(c2w, proj)
    return CameraBatch(
        mvp_mtx=mvp,
        c2w=c2w,
        center_z=center[:, 2],
        elevation_deg=elevation_deg,
        azimuth_deg=azimuth_deg,
        camera_distances=distances,
        fovy=fovy,
    )


def eval_orbit_batch(cfg: CameraSamplerConfig, split: str = "val") -> CameraBatch:
    """The full body+head eval orbit (len = n_views * 2), reference:
    camera_data.py:487-594."""
    n = cfg.n_val_views if split == "val" else cfg.n_test_views
    if split == "val":
        azimuth_deg = jnp.linspace(-180.0, 180.0, n + 1)[:n]
    else:
        azimuth_deg = jnp.linspace(-180.0, 180.0, n)
    elevation_deg = jnp.full((n,), cfg.eval_elevation_deg)
    fovy = deg2rad(jnp.full((n,), cfg.eval_fovy_deg))

    def orbit(distance, z_off):
        d = jnp.full((n,), distance)
        pos = spherical_to_position(
            deg2rad(elevation_deg), deg2rad(azimuth_deg), d
        ).at[:, 2].add(z_off)
        center = jnp.zeros((n, 3)).at[:, 2].add(z_off)
        c2w = look_at_c2w(pos, center, jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1)))
        proj = gl_projection_matrix(fovy, cfg.eval_width / cfg.eval_height,
                                    0.1, 1000.0)
        return c2w, get_mvp_matrix(c2w, proj), center[:, 2], d

    c2w_b, mvp_b, cz_b, d_b = orbit(cfg.eval_camera_distance, 0.0)
    c2w_h, mvp_h, cz_h, d_h = orbit(cfg.eval_camera_distance_head, cfg.head_offset)

    cat = lambda a, b_: jnp.concatenate([a, b_], 0)
    return CameraBatch(
        mvp_mtx=cat(mvp_b, mvp_h),
        c2w=cat(c2w_b, c2w_h),
        center_z=cat(cz_b, cz_h),
        elevation_deg=cat(elevation_deg, elevation_deg),
        azimuth_deg=cat(azimuth_deg, azimuth_deg),
        camera_distances=cat(d_b, d_h),
        fovy=cat(fovy, fovy),
    )


def refine_orbit_batch(n_views: int, elevation_deg: float, distance: float,
                       fovy_deg: float, height: int, width: int) -> CameraBatch:
    """The 32-view refinement orbit (reference: GaussianIP.py:232-281)."""
    azimuth_deg = jnp.linspace(-180.0, 180.0, n_views + 1)[:n_views]
    elev = jnp.full((n_views,), elevation_deg)
    d = jnp.full((n_views,), distance)
    fovy = deg2rad(jnp.full((n_views,), fovy_deg))
    pos = spherical_to_position(deg2rad(elev), deg2rad(azimuth_deg), d)
    c2w = look_at_c2w(pos, jnp.zeros((n_views, 3)),
                      jnp.tile(jnp.array([[0.0, 0, 1]]), (n_views, 1)))
    proj = gl_projection_matrix(fovy, width / height, 0.1, 1000.0)
    return CameraBatch(
        mvp_mtx=get_mvp_matrix(c2w, proj),
        c2w=c2w,
        center_z=jnp.zeros((n_views,)),
        elevation_deg=elev,
        azimuth_deg=azimuth_deg,
        camera_distances=d,
        fovy=fovy,
    )
