"""Pallas TPU tile compositor for differentiable Gaussian splatting.

This is the TPU-native replacement for the CUDA tile renderer the reference
depends on (diff-gaussian-rasterization, consumed at reference:
gaussiansplatting/gaussian_renderer/__init__.py:85-93). The design re-maps the
work onto TPU compute units instead of translating the CUDA kernel:

  * alpha evaluation rides the MXU: log-alpha is a quadratic form in pixel
    coords, so an [8, CHUNK] coefficient block x [8, P] pixel-feature matrix
    yields all CHUNK x P powers in one matmul (see
    preprocess.gaussian_power_coeffs);
  * front-to-back transmittance is a *cumulative product over instances*,
    computed in log space as a triangular-matrix matmul on the MXU
    (strict-lower-triangular ones @ log(1 - alpha)) — no sequential per-
    instance loop;
  * output accumulation (rgb, alpha-weighted depth, alpha) is another MXU
    matmul: [8, CHUNK] instance features x [CHUNK, P] weights;
  * (v2) per-tile instance segments are UNALIGNED slices of the depth-sorted
    compact instance array (binning.py does no chunk re-layout): the kernel
    DMAs the lane-aligned superset window of each segment and masks the head
    rows. Coefficients and features ride ONE [16, CHUNK] DMA per chunk,
    double-buffered so the next chunk streams in while the current one is on
    the MXU;
  * (v2) the backward writes per-instance gradients back into the same
    compact layout. A window's first chunk can be shared with the previous
    tile's last chunk; since the TPU grid executes sequentially, the kernel
    read-modify-writes that single boundary chunk (the owner of a chunk's
    first row writes it fully; later tiles merge into it), so the writes
    stay race-free without any aligned re-layout. The JAX-level reduction to
    per-gaussian gradients is the attribute gather's scatter-add VJP
    (render.py).

Semantics match the CUDA kernel: alpha capped at 0.99 (gradient NOT gated at
the cap, matching the reference kernel's backward), alpha < 1/255 skipped,
early-stop mask T_next >= 1e-4. Background compositing happens in JAX
(rgb + bg * (1 - alpha)).

Backward needs per-instance transmittances. Instead of stashing them, the
forward emits the per-pixel *last contributor index* in the otherwise-unused
output row 5 (f32-exact for < 2^24 instances). Since contributions form a
depth prefix (T is monotone), the backward reconstructs T from the stop point
T_stop = 1 - alpha_out (which the early-stop rule keeps >= 1e-4, so the
reconstruction never divides through an underflowed transmittance — the
failure mode of the CUDA kernel's divide-backward trick) via a reverse
log-space cumulative sum, again as a triangular MXU matmul.

Output rows: 0-2 rgb, 3 alpha-weighted depth, 4 alpha, 5 last-contributor
(window-relative, head rows included).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _pixel_features(tile: int):
    """[8, P] rows: 1, x, y, x^2, xy, y^2, 0, 0 (tile-local pixel coords,
    p = y * tile + x)."""
    p = tile * tile
    idx = jnp.arange(p, dtype=jnp.float32)
    x = idx % tile
    y = idx // tile
    rows = [jnp.ones((p,), jnp.float32), x, y, x * x, x * y, y * y,
            jnp.zeros((p,), jnp.float32), jnp.zeros((p,), jnp.float32)]
    return jnp.stack(rows, axis=0)


def _seg_bounds(starts_ref, counts_ref, b, t, chunk: int):
    """One tile's chunk window: (base, head, total, nchunks). A supertile
    variant (SPT tiles per combined window) was built and MEASURED WORSE
    in r5 (spt2 24.8 / spt4 32.9 vs 21.0 ms fwd+bwd at 1024^2/100k):
    combined windows keep the same total chunk count (segments sum) while
    every pass does SPT x wider elementwise work — the kernel is VPU-
    element-bound, not loop-overhead-bound. Deleted; see NOTES r5."""
    start = starts_ref[b, t]
    count = counts_ref[b, t]
    base = (start // chunk) * chunk
    head = start - base
    total = head + count
    nchunks = jnp.where(count > 0, (total + chunk - 1) // chunk, 0)
    return base, head, total, nchunks


def _tri(c: int, strict: bool, upper: bool):
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    co = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    if upper:
        m = (co > r) if strict else (co >= r)
    else:
        m = (co < r) if strict else (co <= r)
    return m.astype(jnp.float32)


def _dot(a, b, contract, precision=jax.lax.Precision.HIGHEST):
    # HIGHEST: full-f32 MXU passes — the power quadratic form cancels large
    # terms, so bf16 mantissas visibly corrupt alpha (q99 error ~1e-2)
    return jax.lax.dot_general(
        a, b, (contract, ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )


def _dot_tri(tri_m, x, contract, split: bool):
    """Triangular cumulative-sum matmul tri_m @ x.

    split=True: tri_m is EXACTLY representable in bf16 (entries 0/1), so
    splitting only x into bf16 hi+lo halves (x = x_hi + x_lo to ~2^-17
    relative) gives near-f32 accuracy in TWO single-pass bf16 MXU matmuls —
    3x cheaper than the 6-pass f32 HIGHEST product (A/B: probe_vjpab.py)."""
    if not split:
        return _dot(tri_m, x, contract)
    t16 = tri_m.astype(jnp.bfloat16)
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = jax.lax.Precision.DEFAULT
    return (_dot(t16, x_hi, contract, d) + _dot(t16, x_lo, contract, d))


def _chunk_alphas(coeff_chunk_t, featpix, lo, hi, ci, chunk):
    """Shared fwd/bwd math: (raw, alpha, log_om) for one chunk.

    coeff_chunk_t is the transposed [8, C] coefficient block; live rows are
    window indices in [lo, hi) (lo = head offset of the unaligned
    segment)."""
    c = chunk
    p = featpix.shape[1]
    power = _dot(coeff_chunk_t, featpix, ((0,), (0,)))  # [C, P]
    raw = jnp.exp(power)
    alpha = jnp.minimum(raw, ALPHA_MAX)
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, p), 0) + ci * chunk
    live = (rows >= lo) & (rows < hi) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(live, alpha, 0.0)
    log_om = jnp.log1p(-alpha)
    return raw, alpha, log_om


def _data_copy(data_hbm, buf, sems, b, base, ci, slot, chunk):
    return pltpu.make_async_copy(
        data_hbm.at[b, :, pl.ds(pl.multiple_of(base + ci * chunk, chunk),
                                chunk)],
        buf.at[slot],
        sems.at[slot],
    )


def _fwd_tile_stream(starts_ref, counts_ref, data_hbm, featpix, tri_ex,
                     out_ref, buf, sems, b, t, tl, *, chunk: int, tile: int,
                     tri_split: bool):
    """One tile's forward compositing with per-chunk double-buffered
    streaming DMAs."""
    p = tile * tile
    log_eps = jnp.float32(-9.22)  # log(1e-4)
    base, head, total, nchunks = _seg_bounds(
        starts_ref, counts_ref, b, t, chunk)

    @pl.when(nchunks > 0)
    def _():
        _data_copy(data_hbm, buf, sems, b, base, 0, 0, chunk).start()

    def cond(carry):
        ci, log_t, last = carry
        return (ci < nchunks) & (jnp.max(log_t) >= log_eps)

    def body(carry):
        ci, log_t, last = carry
        slot = ci % 2

        @pl.when(ci + 1 < nchunks)
        def _():
            _data_copy(data_hbm, buf, sems, b, base, ci + 1, (ci + 1) % 2,
                       chunk).start()

        _data_copy(data_hbm, buf, sems, b, base, ci, slot, chunk).wait()
        coeff = buf[slot, 0:8]
        feat = buf[slot, 8:16]
        raw, alpha, log_om = _chunk_alphas(coeff, featpix, head, total,
                                           ci, chunk)
        # exclusive cumulative log-transmittance via MXU tri matmul
        cum_ex = _dot_tri(tri_ex, log_om, ((1,), (0,)), tri_split)
        t_excl = jnp.exp(log_t + cum_ex)
        t_incl = t_excl * (1.0 - alpha)
        contrib = (t_incl >= T_EPS) & (alpha > 0.0)
        w = jnp.where(contrib, alpha * t_excl, 0.0)
        out_ref[0, tl] += _dot(feat, w, ((1,), (0,)))

        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, p), 0)
        idxf = (rows + ci * chunk).astype(jnp.float32)
        last = jnp.maximum(
            last,
            jnp.max(jnp.where(contrib, idxf, -1.0), axis=0,
                    keepdims=True))
        log_t_new = (log_t + cum_ex[chunk - 1 : chunk, :]
                     + log_om[chunk - 1 : chunk, :])
        return (ci + 1, log_t_new, last)

    ci_x, _, last = jax.lax.while_loop(
        cond,
        body,
        (jnp.int32(0), jnp.zeros((1, p), jnp.float32),
         jnp.full((1, p), -1.0, jnp.float32)),
    )
    # early exit leaves the prefetched chunk ci_x in flight: drain it so
    # the semaphore is clean for the next tile / program instance
    @pl.when((ci_x >= 1) & (ci_x < nchunks))
    def _():
        _data_copy(data_hbm, buf, sems, b, base, ci_x, ci_x % 2,
                   chunk).wait()

    out_ref[0, tl, 5:6, :] = last


def _fwd_kernel(
    starts_ref, counts_ref,  # scalar prefetch [B, NT]
    data_hbm, featpix_ref,  # inputs
    out_ref,  # output block (1, TPB, 8, P)
    buf, sems,  # scratch: [2, 16, CHUNK] double buffer
    *, chunk: int, tile: int, tpb: int, tri_split: bool = False,
):
    b = pl.program_id(0)
    tg = pl.program_id(1)
    p = tile * tile

    featpix = featpix_ref[:]
    tri_ex = _tri(chunk, strict=True, upper=False)

    # TPB consecutive tiles per program: the grid-dispatch overhead at
    # grid=NT (~1 us/program x 4096) dominated the whole kernel — see
    # scripts/probe_vjpab.py / NOTES r3
    for tl in range(tpb):
        t = tg * tpb + tl
        out_ref[0, tl] = jnp.zeros((8, p), jnp.float32)
        _fwd_tile_stream(starts_ref, counts_ref, data_hbm, featpix, tri_ex,
                         out_ref, buf, sems, b, t, tl, chunk=chunk, tile=tile,
                         tri_split=tri_split)


def _bwd_kernel(
    starts_ref, counts_ref,
    data_hbm, featpix_ref, out_ref, gout_ref, dgrad_init_hbm,
    dgrad_hbm,
    buf, dbuf, rmw_buf, sems, wsem, rsem,
    *, chunk: int, tile: int, tpb: int, tri_split: bool = False,
):
    del dgrad_init_hbm  # aliased to dgrad_hbm (pre-zeroed); never read
    b = pl.program_id(0)
    tg = pl.program_id(1)
    p = tile * tile

    featpix = featpix_ref[:]
    tri_in_up = _tri(chunk, strict=False, upper=True)  # inclusive suffix sums
    tri_ex_up = _tri(chunk, strict=True, upper=True)  # exclusive suffix sums

    # TPB consecutive tiles per program (grid-dispatch overhead — see
    # _fwd_kernel). Writes are drained before each tile ends, so the
    # sequential-RMW boundary argument is unchanged tile-to-tile.
    for tl in range(tpb):
        t = tg * tpb + tl
        base, head, total, nchunks_all = _seg_bounds(
            starts_ref, counts_ref, b, t, chunk)

        gout = gout_ref[0, tl]  # [8, P]
        alpha_out = out_ref[0, tl, 4:5, :]
        last = out_ref[0, tl, 5:6, :]
        # only chunks up to the last contributor carry gradient
        max_last = jnp.max(last).astype(jnp.int32)
        nchunks = jnp.minimum(
            nchunks_all, jnp.where(max_last < 0, 0, max_last // chunk + 1))
        # early-stop keeps T_stop >= 1e-4: 1 - alpha_out is well conditioned
        log_t_stop = jnp.log(jnp.maximum(1.0 - alpha_out, 1e-12))

        def write_copy(ci, slot):
            return pltpu.make_async_copy(
                dbuf.at[slot],
                dgrad_hbm.at[b, :, pl.ds(
                    pl.multiple_of(base + ci * chunk, chunk), chunk)],
                wsem.at[slot],
            )

        def write_chunk(ci, values16, have_prev):
            """SET or merge (RMW) one [16, chunk] gradient chunk,
            double-buffered (the write streams out while the next chunk
            computes).

            The owner of a chunk's first row (head == 0 or ci > 0) writes
            the whole chunk; otherwise (our unaligned head chunk) merge with
            what the previous tile already wrote. Tiles run sequentially
            (python loop within the program, sequential grid across
            programs) and every tile drains its writes before ending, so
            prior writes have landed."""
            slot = ci % 2
            rows = jax.lax.broadcasted_iota(jnp.int32, (16, chunk), 1)
            idx = rows + ci * chunk
            mine = (idx >= head) & (idx < total)

            @pl.when(have_prev)
            def _():
                # this slot's previous write (ci + 2) must land before reuse
                write_copy(ci + 2, slot).wait()

            @pl.when((ci > 0) | (head == 0))
            def _():
                dbuf[slot] = jnp.where(mine, values16, 0.0)

            @pl.when((ci == 0) & (head > 0))
            def _():
                rd = pltpu.make_async_copy(
                    dgrad_hbm.at[b, :, pl.ds(pl.multiple_of(base, chunk),
                                             chunk)],
                    rmw_buf,
                    rsem,
                )
                rd.start()
                rd.wait()
                dbuf[slot] = jnp.where(mine, values16, rmw_buf[:])

            write_copy(ci, slot).start()

        @pl.when(nchunks > 0)
        def _():
            _data_copy(data_hbm, buf, sems, b, base, nchunks - 1,
                       (nchunks - 1) % 2, chunk).start()

        def body(i, carry):
            r_carry, log_s_carry = carry
            ci = nchunks - 1 - i
            slot = ci % 2

            @pl.when(ci >= 1)
            def _():
                _data_copy(data_hbm, buf, sems, b, base, ci - 1,
                           (ci - 1) % 2, chunk).start()

            _data_copy(data_hbm, buf, sems, b, base, ci, slot,
                       chunk).wait()
            coeff = buf[slot, 0:8]
            feat = buf[slot, 8:16]
            raw, alpha, log_om = _chunk_alphas(coeff, featpix, head, total,
                                               ci, chunk)
            rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, p), 0)
            idxf = (rows + ci * chunk).astype(jnp.float32)
            contrib = (alpha > 0.0) & (idxf <= last)
            lom = jnp.where(contrib, log_om, 0.0)
            # T_excl_i = T_stop / prod_{j>=i, contrib} om_j (rev log-cumsum)
            s_incl = (_dot_tri(tri_in_up, lom, ((1,), (0,)), tri_split)
                      + log_s_carry)
            t_excl = jnp.where(contrib, jnp.exp(log_t_stop - s_incl), 0.0)
            w = alpha * t_excl

            t1 = _dot(feat, gout, ((0,), (0,)))  # [C, P]
            t1w = t1 * w
            r_rows = (_dot_tri(tri_ex_up, t1w, ((1,), (0,)), tri_split)
                      + r_carry)  # suffix sums
            dalpha = jnp.where(
                contrib, t1 * t_excl - r_rows / (1.0 - alpha), 0.0)
            # gradient NOT gated at the 0.99 cap (parity with CUDA backward)
            dpower = jnp.where(contrib, dalpha * raw, 0.0)

            dcoeff = _dot(featpix, dpower, ((1,), (1,)))  # [8, C]
            dfeat = _dot(gout, w, ((1,), (1,)))  # [8, C]
            write_chunk(ci, jnp.concatenate([dcoeff, dfeat], axis=0),
                        have_prev=i >= 2)
            r_carry_new = r_rows[0:1, :] + t1w[0:1, :]
            log_s_carry_new = s_incl[0:1, :]
            return (r_carry_new, log_s_carry_new)

        jax.lax.fori_loop(
            0,
            nchunks,
            body,
            (jnp.zeros((1, p), jnp.float32),
             jnp.zeros((1, p), jnp.float32)),
        )

        # drain the (at most one per slot) in-flight writes; chunks past the
        # last contributor are never written — the output buffer is
        # pre-zeroed and boundary rows were SET to zero by their owning tile
        @pl.when(nchunks >= 1)
        def _():
            write_copy(0, 0).wait()

        @pl.when(nchunks >= 2)
        def _():
            write_copy(1, 1).wait()


def _pick_tpb(nt: int) -> int:
    # largest divisor of NT <= 8: amortizes the ~us per-program dispatch
    # overhead (grid 4096 -> 512 at 1024^2) while keeping the output block
    # within VMEM (tpb * 8 * 256 * 4B = 64 KiB at tpb=8)
    for tpb in (8, 4, 2):
        if nt % tpb == 0:
            return tpb
    return 1


def _fwd_call(data, starts, counts, tile, chunk, interpret, tri="highest"):
    b, _, epad = data.shape
    nt = starts.shape[1]
    p = tile * tile
    tpb = _pick_tpb(nt)
    featpix = _pixel_features(tile)
    scratch = [
        pltpu.VMEM((2, 16, chunk), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    kern = _fwd_kernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt // tpb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, p), lambda bb, tt, sb, st: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tpb, 8, p),
                               lambda bb, tt, sb, st: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(kern, chunk=chunk, tile=tile, tpb=tpb,
                          tri_split=(tri == "split2")),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nt, 8, p), jnp.float32),
        interpret=interpret,
    )(starts, counts, data, featpix)
    return out


def _bwd_call(data, starts, counts, out, gout, tile, chunk, interpret,
              tri="highest"):
    b, _, epad = data.shape
    nt = starts.shape[1]
    p = tile * tile
    tpb = _pick_tpb(nt)
    featpix = _pixel_features(tile)
    scratch = [
        pltpu.VMEM((2, 16, chunk), jnp.float32),
        pltpu.VMEM((2, 16, chunk), jnp.float32),
        pltpu.VMEM((16, chunk), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    ]
    kern = functools.partial(
        _bwd_kernel, chunk=chunk, tile=tile, tpb=tpb,
        tri_split=(tri == "split2"))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt // tpb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, p), lambda bb, tt, sb, st: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpb, 8, p),
                         lambda bb, tt, sb, st: (bb, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpb, 8, p),
                         lambda bb, tt, sb, st: (bb, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    dgrad = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 16, epad), jnp.float32),
        interpret=interpret,
        input_output_aliases={6: 0},  # pre-zeroed dgrad buffer (args: 2
        #                               scalar-prefetch + 4 inputs + this)
    )(starts, counts, data, featpix, out, gout,
      jnp.zeros((b, 16, epad), jnp.float32))
    return dgrad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def composite_tiles(data, starts, counts, tile: int, chunk: int,
                    interpret: bool = False, tri: str = "highest"):
    """Composite depth-sorted instance segments into per-tile accumulators.

    Args:
      data: [B, 16, EPAD] transposed instance blocks — rows 0-7 the power
        coefficients (gaussian_power_coeffs + 2 pad rows), rows 8-15 the
        features [r, g, b, depth, 1, 0, 0, 0]. EPAD must leave >= 2*chunk
        slack beyond the last live instance (window rounding).
      starts/counts: [B, NT] int32 UNALIGNED segment layout from binning.
    Returns:
      [B, NT, 8, P] accumulators: rows 0-2 rgb, 3 alpha-weighted depth,
      4 accumulated alpha, 5 last-contributor index (internal).
    """
    return _fwd_call(data, starts, counts, tile, chunk, interpret, tri)


def _composite_fwd(data, starts, counts, tile, chunk, interpret, tri):
    out = _fwd_call(data, starts, counts, tile, chunk, interpret, tri)
    return out, (data, starts, counts, out)


def _composite_bwd(tile, chunk, interpret, tri, res, gout):
    data, starts, counts, out = res
    dgrad = _bwd_call(data, starts, counts, out, gout, tile, chunk, interpret,
                      tri)
    return dgrad, None, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def tiles_to_image(out, n_tiles_y: int, n_tiles_x: int, tile: int,
                   height: int, width: int):
    """[B, NT, 8, P] -> rgb [B, H, W, 3], depth [B, H, W], alpha [B, H, W]."""
    b = out.shape[0]
    img = out.reshape(b, n_tiles_y, n_tiles_x, 8, tile, tile)
    img = img.transpose(0, 3, 1, 4, 2, 5)  # [B, 8, ty, tile, tx, tile]
    img = img.reshape(b, 8, n_tiles_y * tile, n_tiles_x * tile)
    img = img[:, :, :height, :width]
    rgb = img[:, 0:3].transpose(0, 2, 3, 1)
    depth = img[:, 3]
    alpha = img[:, 4]
    return rgb, depth, alpha
