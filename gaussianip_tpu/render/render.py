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
reference fallback for CPU/debug. Instance attributes ride one packed gather
(TPU gathers amortize over row width), unrolled per camera, with XLA's
scatter-add VJP (a hand-built emission-order reduction measured ~4 ms slower
end-to-end and was removed — scripts/probe_vjpcut.py, r4).
"""

from __future__ import annotations

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
    pool: int = struct.field(pytree_node=False, default=0)  # 0 = auto
    # inline instance slots per gaussian before drawing from the shared
    # overflow pool. 1 measured fastest at 1024^2/100k (the sort universe
    # inline*N + pool is smallest; scripts/probe_inline.py: 53 -> 40.5 ms)
    inline: int = struct.field(pytree_node=False, default=1)
    # carry the gaussian id through the main sort (3rd operand) vs recover
    # it post-sort with one gather from the emission-order gid table
    carry_gid: bool = struct.field(pytree_node=False, default=True)
    # precision of the triangular log-transmittance matmuls in the
    # compositor ("highest" = 6-pass f32, "split2" = two bf16 passes on a
    # hi+lo split). split2 measured ~equal accuracy (tests) and part of the
    # 33.85->29.89 ms combo win (scripts/probe_sorttri.py, r4 TPU A/B)
    # (Deleted measured losers, r5: vjp_mode="emission" — ~4 ms slower
    # end-to-end than the scatter VJP despite a 10x-flattering microbench;
    # head_prefetch=True — 29.42 vs 28.58 ms; span-mode compositor —
    # 24.15 vs 23.81 ms fwd+bwd; ownership="sorted" — 28.07 vs 23.74 ms.
    # scripts/probe_{vjpcut,packab,span,variants}.py, NOTES.md.)
    tri: str = struct.field(pytree_node=False, default="split2")
    # kernel-data assembly: "t16" materializes [B, E, 16] then swapaxes to
    # [B, 16, EPAD] (one explicit relayout); "stack" writes the 16 channel
    # planes [B, E] directly into [B, 16, EPAD] via jnp.stack(axis=1) so the
    # gather + coefficient math fuse into per-plane writes with no transpose
    # op (A/B r3 pending — probe_cut.py)
    pack_mode: str = struct.field(pytree_node=False, default="t16")
    # within-tile depth ordering carrier in the binning sort: "rank"
    # (one stable N argsort -> packed tile|rank key), "exact2" (two-key
    # lexicographic (tile, f32-depth-bits) sort — no argsort, exact), or
    # "q16" (packed tile|quantized-depth key — no argsort, approximate
    # within range/65536). See binning.bin_instances. q16 is the measured
    # default: the narrow packed key sorts fastest and the residual
    # within-bucket order ambiguity is < range/65536 in depth
    # (scripts/probe_binkey.py + probe_sorttri.py: rank 33.85 ->
    # q16+unstable+split2 29.89 ms fwd+bwd at 1024^2/100k)
    depth_key: str = struct.field(pytree_node=False, default="q16")
    # stability of the main instance sort. Live keys are unique under
    # rank/exact2, so False is result-equivalent there (dead-slot order may
    # vary); an unstable sort can lower cheaper in XLA. Under q16 ties
    # (same tile, same depth bucket) compose in sort-network order —
    # deterministic for a compiled program, but not source order
    sort_stable: bool = struct.field(pytree_node=False, default=False)
    # pool-tier per-gaussian table gather in binning: "u16" (bit-exact
    # 16-bit reinterpretation — 16-bit-element gathers lower onto a faster
    # TPU path) or "i32" (plain row gather). r5 A/B at 1024^2/100k
    # (scripts/probe_variants.py): u16 8.55/22.43 ms fwd/f+b vs i32
    # 10.19/23.74 — u16 is the measured default
    table_gather: str = struct.field(pytree_node=False, default="u16")
    # circle-vs-tile-rect instance culling in binning: drops bbox corner
    # tiles the opacity-tightened radius provably cannot touch (alpha <
    # 1/255 everywhere in the tile — the compositor zeroes those pixels
    # anyway, so output is preserved up to T_EPS-scale early-stop
    # reassociation; see binning.bin_instances)
    tile_cull: bool = struct.field(pytree_node=False, default=True)
    # (r5 deleted losers, all TPU-measured at 1024^2/100k fwd+bwd vs the
    # ~21-22 ms base: supertile compositor spt2/4 24.8/32.9 — combined
    # windows keep the chunk count but widen every elementwise pass;
    # tpb=16 23.5; gather_vjp="sort" (backward-only argsort + cumsum
    # segment reduction) 35.9 — XLA's scatter-add VJP wins in context
    # even though probe_cut attributes ~7 ms to it; the dT/pad64/pack3
    # attention layouts; see NOTES r5 and probe_{variants,attnpack}.)
    backend: str = struct.field(pytree_node=False, default="auto")
    interpret: bool = struct.field(pytree_node=False, default=False)


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray  # [B, H, W, 3]
    depth: jnp.ndarray  # [B, H, W] alpha-weighted view-z
    alpha: jnp.ndarray  # [B, H, W]
    radii: jnp.ndarray  # [B, N] int32
    n_dropped: jnp.ndarray  # [B] instances lost to pool overflow


def _resolve_backend(cfg: RenderConfig) -> str:
    if cfg.backend != "auto":
        return cfg.backend
    return "pallas" if jax.default_backend() == "tpu" else "reference"




def _auto_pool(n: int, chunk: int, h: int, w: int, inline: int = 1,
               tile: int = 16, d_max: int = 25) -> int:
    """Overflow-pool sizing: big-footprint duplicates beyond the inline tier
    scale with resolution^2 (bench scene at 1024^2: 380k live instances,
    280k extras beyond inline=1 — scripts/probe_inline.py). Every pool slot
    costs sort+gather+reduction time whether live or not, so the pool is
    sized ~1.25x the measured extras; overflow is reported in n_dropped.
    Tiny renders (<= 64 tiles) get the exact worst case instead — footprints
    there cover most of the screen and the exact pool is still small."""
    nt = -(-w // tile) * -(-h // tile)
    worst = n * max(min(d_max, nt) - inline, 1)
    if nt <= 64:
        pool = worst
    else:
        res_scale = max((h * w) / float(1024 * 1024), 0.05)
        pool = min(worst,
                   max(int((3.5 - 0.35 * (inline - 1)) * n * res_scale),
                       2 * n, 2 * chunk))
    return -(-max(pool, 2 * chunk) // chunk) * chunk


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
    pool = cfg.pool or _auto_pool(n, cfg.chunk, h, w, cfg.inline,
                                  cfg.tile, cfg.d_max)
    e = cfg.inline * n + pool
    # slack beyond the last live instance: streaming windows need 2 chunks
    # (the extra +4 matches the removed span kernel's granule overshoot and
    # is kept so default graph shapes — and the compile cache — are stable)
    epad = (-(-(e + cfg.chunk) // cfg.chunk)) * cfg.chunk + 4 * cfg.chunk

    # UNROLLED over the (static, small) camera batch instead of vmap:
    # batched lax.sort / searchsorted / scatter lower onto much slower TPU
    # paths — vmap(B=1) alone DOUBLED bin_instances (4.0 -> 8.9 ms at
    # 1024^2/100k, scripts/probe_binparts.py full vs vfull, r4)
    per_cam = [
        bin_instances(
            proj.mean2d[i], proj.radius_bin[i], proj.depth[i],
            proj.valid[i], proj.radius_cull[i],
            tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
            d_max=cfg.d_max, pool=pool, chunk=cfg.chunk,
            inline=cfg.inline,
            carry_gid=cfg.carry_gid,
            depth_key=cfg.depth_key,
            sort_stable=cfg.sort_stable,
            tile_cull=cfg.tile_cull,
            table_gather=cfg.table_gather,
        )
        for i in range(b)
    ]
    binning = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_cam)

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
    # unrolled per camera (like the binning above): the batched gather
    # AND its scatter-add VJP lower faster without the batch dim
    gidx_safe = jnp.minimum(binning.gidx, n - 1)
    inst = jnp.stack([
        jnp.take_along_axis(packed[i], gidx_safe[i][:, None], axis=0)
        for i in range(b)
    ])
    inst = jnp.where((binning.gidx < n)[..., None], inst, 0.0)
    rv = (binning.gidx < n)[..., None]

    tile_safe = jnp.minimum(binning.tile_of, ntx * nty - 1)
    origin = jnp.stack(
        [(tile_safe % ntx) * tile, (tile_safe // ntx) * tile], axis=-1
    ).astype(jnp.float32)
    local = inst[..., 0:2] - origin
    coeff6 = gaussian_power_coeffs(local, inst[..., 2:5], inst[..., 5])
    ones = jnp.ones_like(inst[..., 9])
    zeros = jnp.zeros_like(ones)
    assert cfg.pack_mode in ("t16", "stack"), cfg.pack_mode
    if cfg.pack_mode == "stack":
        # per-plane assembly: no transpose op — each [B, E] channel plane is
        # an elementwise function of the gathered rows, written contiguously
        rv1 = rv[..., 0]
        z1 = jnp.zeros_like(ones)
        planes = [jnp.where(rv1, coeff6[..., i], 0.0) for i in range(6)]
        planes += [z1, z1]
        planes += [jnp.where(rv1, inst[..., 6 + i], 0.0) for i in range(3)]
        planes += [jnp.where(rv1, inst[..., 9], 0.0),
                   jnp.where(rv1, ones, 0.0), z1, z1, z1]
        data = jnp.stack(planes, axis=1)  # [B, 16, E]
        data = jnp.pad(data, ((0, 0), (0, 0), (0, epad - e)))
    else:
        coeff8 = jnp.where(
            rv,
            jnp.concatenate([coeff6, jnp.zeros_like(coeff6[..., :2])],
                            axis=-1),
            0.0,
        )
        feat8 = jnp.where(
            rv,
            jnp.stack(
                [inst[..., 6], inst[..., 7], inst[..., 8],
                 inst[..., 9], ones, zeros, zeros, zeros], axis=-1,
            ),
            0.0,
        )

        # transposed [B, 16, EPAD] layout: one lane-aligned DMA per chunk in
        # the kernel (coeff rows 0-7, feature rows 8-15)
        data = jnp.swapaxes(jnp.concatenate([coeff8, feat8], axis=-1), 1, 2)
        data = jnp.pad(data, ((0, 0), (0, 0), (0, epad - e)))
    out = composite_tiles(
        data, binning.starts, binning.counts, tile, cfg.chunk, cfg.interpret,
        cfg.tri,
    )
    rgb, depth, alpha = tiles_to_image(out, nty, ntx, tile, h, w)
    bgc = jnp.asarray(bg_color, jnp.float32)
    rgb = rgb + bgc[None, None, None, :] * (1.0 - alpha[..., None])
    return RenderOutput(rgb, depth, alpha, proj.radius, binning.n_dropped)


def count_live_instances(
    gaussians, cameras, cfg: RenderConfig = RenderConfig()
) -> jnp.ndarray:
    """[B] live (post-binning) instance counts — the real per-camera
    compositing workload. Used by bench.py's roofline accounting so HBM/MXU
    estimates reflect the measured scene instead of a hard-coded count."""
    deg = gaussians.active_sh_degree
    xyz = gaussians.xyz
    n = xyz.shape[0]
    scales = gaussians.get_scaling()
    opac = gaussians.get_opacity()[:, 0]
    feats = gaussians.get_features()
    active = gaussians.active_mask()
    b = jax.tree_util.tree_leaves(cameras)[0].shape[0]
    off = jnp.zeros((b, n, 2), jnp.float32)
    proj = jax.vmap(
        lambda cam, o: project_gaussians(
            xyz, scales, gaussians.rotation, opac, feats, cam, deg, 1.0, o,
            None, active,
        )
    )(cameras, off)
    h, w = cameras.height, cameras.width
    tile = cfg.tile
    ntx, nty = -(-w // tile), -(-h // tile)
    pool = cfg.pool or _auto_pool(n, cfg.chunk, h, w, cfg.inline,
                                  cfg.tile, cfg.d_max)
    per_cam = [
        bin_instances(
            proj.mean2d[i], proj.radius_bin[i], proj.depth[i],
            proj.valid[i], proj.radius_cull[i],
            tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
            d_max=cfg.d_max, pool=pool, chunk=cfg.chunk, inline=cfg.inline,
            tile_cull=cfg.tile_cull,
            table_gather=cfg.table_gather,
        )
        for i in range(b)
    ]
    binning = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_cam)
    return jnp.sum(binning.counts, axis=1)


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
