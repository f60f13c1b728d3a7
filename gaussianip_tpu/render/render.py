"""Public splat-render API.

Mirrors the capability of the reference's render wrappers (reference:
gaussiansplatting/gaussian_renderer/__init__.py:18-193 — `render` and the
math-identical `render_with_smaller_scale`): given a GaussianState and a batch
of cameras, produce rgb / depth / alpha images, per-gaussian screen radii, and
(via `mean2d_offset`) NDC-space viewspace-gradient hooks for densification
statistics.

TPU-first differences: the whole camera batch renders in one jitted, vmapped
call (the reference loops cameras in Python, reference: GaussianIP.py:154-204);
the compositor is the Pallas MXU kernel (composite_pallas.py) with a pure-JAX
reference fallback for CPU/debug.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .binning import bin_instances
from .composite_pallas import composite_tiles, tiles_to_image
from .composite_ref import composite_reference
from .preprocess import gaussian_power_coeffs, project_gaussians


@struct.dataclass
class RenderConfig:
    tile: int = struct.field(pytree_node=False, default=16)
    chunk: int = struct.field(pytree_node=False, default=128)
    d_max: int = struct.field(pytree_node=False, default=25)
    icap: int = struct.field(pytree_node=False, default=0)  # 0 = auto
    backend: str = struct.field(pytree_node=False, default="auto")
    interpret: bool = struct.field(pytree_node=False, default=False)


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray  # [B, H, W, 3]
    depth: jnp.ndarray  # [B, H, W] alpha-weighted view-z
    alpha: jnp.ndarray  # [B, H, W]
    radii: jnp.ndarray  # [B, N] int32
    n_dropped: jnp.ndarray  # [B] instances lost to icap overflow (observability)


def _resolve_backend(cfg: RenderConfig) -> str:
    if cfg.backend != "auto":
        return cfg.backend
    return "pallas" if jax.default_backend() == "tpu" else "reference"


def _auto_icap(n: int, d_max: int, chunk: int, h: int, w: int) -> int:
    # instance traffic scales with icap; ~4 duplicates/gaussian measured for
    # trained scenes at 16px tiles and 1024^2 — footprint area (hence
    # duplicate count) scales with resolution^2 (overflow is reported in
    # n_dropped)
    res_scale = max((h * w) / float(1024 * 1024), 0.05)
    icap = min(n * d_max, max(int(8 * n * res_scale), 2 * n, 1 << 17))
    return -(-icap // chunk) * chunk


def render(
    gaussians,
    cameras,
    bg_color,
    cfg: RenderConfig = RenderConfig(),
    mean2d_offset: Optional[jnp.ndarray] = None,
    scaling_modifier: float = 1.0,
    override_color=None,
    active_sh_degree: Optional[int] = None,
) -> RenderOutput:
    """Render a GaussianState into a batch of cameras.

    cameras: a Camera pytree with leading batch dim B on its array leaves
    (height/width static and shared). bg_color: [3].
    mean2d_offset: optional [B, N, 2] zeros; its gradient is the NDC viewspace
    gradient used by densification stats (reference: GaussianIP.py:452-457).
    """
    deg = gaussians.active_sh_degree if active_sh_degree is None else active_sh_degree
    xyz = gaussians.xyz
    n = xyz.shape[0]
    scales = gaussians.get_scaling()
    opac = gaussians.get_opacity()[:, 0]
    feats = gaussians.get_features()
    active = gaussians.active_mask()
    b = jax.tree_util.tree_leaves(cameras)[0].shape[0]
    if mean2d_offset is None:
        mean2d_offset = jnp.zeros((b, n, 2), jnp.float32)

    proj = jax.vmap(
        lambda cam, off: project_gaussians(
            xyz, scales, gaussians.rotation, opac, feats, cam, deg,
            scaling_modifier, off, override_color, active,
        )
    )(cameras, mean2d_offset)

    h, w = cameras.height, cameras.width
    backend = _resolve_backend(cfg)
    if backend == "reference":
        rgb, depth, alpha = jax.vmap(
            lambda m, c, col, o, z, v: composite_reference(m, c, col, o, z, v, h, w)
        )(proj.mean2d, proj.conic, proj.color, proj.opacity * jnp.ones((b, n)),
          proj.depth, proj.valid)
        bgc = jnp.asarray(bg_color, jnp.float32)
        rgb = rgb + bgc[None, None, None, :] * (1.0 - alpha[..., None])
        return RenderOutput(rgb, depth, alpha, proj.radius,
                            jnp.zeros((b,), jnp.int32))

    tile = cfg.tile
    ntx = -(-w // tile)
    nty = -(-h // tile)
    icap = cfg.icap or _auto_icap(n, cfg.d_max, cfg.chunk, h, w)

    binning = jax.vmap(
        lambda m, r, z, v: bin_instances(
            m, r, z, v, tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
            d_max=cfg.d_max, icap=icap, chunk=cfg.chunk,
        )
    )(proj.mean2d, proj.radius, proj.depth, proj.valid)

    # ONE wide packed gather (TPU gathers amortize over row width): pack the
    # 10 per-gaussian attributes, gather once by instance index, then build
    # coefficients elementwise
    packed = jnp.concatenate(
        [
            proj.mean2d,  # 0:2
            proj.conic,  # 2:5
            (proj.opacity * jnp.ones((b, n)))[..., None],  # 5
            proj.color,  # 6:9
            proj.depth[..., None],  # 9
        ],
        axis=-1,
    )  # [B, N, 10]
    gidx_safe = jnp.minimum(binning.gidx, n - 1)  # [B, IPAD]
    inst = jnp.take_along_axis(packed, gidx_safe[..., None], axis=1)
    rv = (binning.gidx < n)[..., None]
    inst = jnp.where(rv, inst, 0.0)

    tile_safe = jnp.minimum(binning.tile_of, ntx * nty - 1)
    origin = jnp.stack(
        [(tile_safe % ntx) * tile, (tile_safe // ntx) * tile], axis=-1
    ).astype(jnp.float32)
    local = inst[..., 0:2] - origin
    coeff6 = gaussian_power_coeffs(local, inst[..., 2:5], inst[..., 5])
    coeff8 = jnp.where(
        rv,
        jnp.concatenate([coeff6, jnp.zeros_like(coeff6[..., :2])], axis=-1),
        0.0,
    )
    ones = jnp.ones_like(inst[..., 9])
    zeros = jnp.zeros_like(ones)
    feat8 = jnp.where(
        rv,
        jnp.stack(
            [inst[..., 6], inst[..., 7], inst[..., 8],
             inst[..., 9], ones, zeros, zeros, zeros], axis=-1,
        ),
        0.0,
    )

    # transposed [B, 8, IPAD] layout -> lane-aligned DMA slices in the kernel
    out = composite_tiles(
        jnp.swapaxes(coeff8, 1, 2), jnp.swapaxes(feat8, 1, 2),
        binning.starts, binning.counts, tile, cfg.chunk, cfg.interpret,
    )
    rgb, depth, alpha = tiles_to_image(out, nty, ntx, tile, h, w)
    bgc = jnp.asarray(bg_color, jnp.float32)
    rgb = rgb + bgc[None, None, None, :] * (1.0 - alpha[..., None])
    return RenderOutput(rgb, depth, alpha, proj.radius, binning.n_dropped)


def render_deformed(
    gaussians,
    xyz,
    rotation,
    cameras,
    bg_color,
    cfg: RenderConfig = RenderConfig(),
    **kw,
):
    """Render with explicit overridden positions/rotations (the animation /
    avatar deformation path; reference:
    gaussiansplatting/gaussian_renderer/__init__.py:195-265 render_deformed).
    Other attributes come from `gaussians`."""
    n = gaussians.capacity
    g = gaussians.replace(
        xyz=gaussians.xyz.at[: xyz.shape[0]].set(xyz),
        rotation=gaussians.rotation.at[: rotation.shape[0]].set(rotation),
    )
    return render(g, cameras, bg_color, cfg, **kw)
