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
    per-gaussian gradients happens via emission-order gathers (render.py).

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
    window indices in [lo, hi) (lo = head offset of the unaligned segment)."""
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
    streaming DMAs (shared by the plain kernel and the span kernel's
    overflow fallback)."""
    p = tile * tile
    log_eps = jnp.float32(-9.22)  # log(1e-4)
    start = starts_ref[b, t]
    count = counts_ref[b, t]
    base = (start // chunk) * chunk
    head = start - base
    total = head + count
    nchunks = jnp.where(count > 0, (total + chunk - 1) // chunk, 0)

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
    buf, dbuf, rmw_buf, sems, wsem, rsem, head_buf, head_sems,
    *, chunk: int, tile: int, tpb: int, tri_split: bool = False,
    hp: bool = False,
):
    del dgrad_init_hbm  # aliased to dgrad_hbm (pre-zeroed); never read
    b = pl.program_id(0)
    tg = pl.program_id(1)
    p = tile * tile

    featpix = featpix_ref[:]
    tri_in_up = _tri(chunk, strict=False, upper=True)  # inclusive suffix sums
    tri_ex_up = _tri(chunk, strict=True, upper=True)  # exclusive suffix sums

    def tile_nchunks(t):
        start = starts_ref[b, t]
        count = counts_ref[b, t]
        base = (start // chunk) * chunk
        nchunks_all = jnp.where(
            count > 0, (start - base + count + chunk - 1) // chunk, 0)
        return base, nchunks_all

    def head_copy(tl, t):
        """The tile's LAST gradient-carrying chunk (bwd processes chunks in
        reverse, so this is the first one needed)."""
        base, nchunks_all = tile_nchunks(t)
        ml = jnp.max(out_ref[0, tl, 5:6, :]).astype(jnp.int32)
        nch = jnp.minimum(nchunks_all,
                          jnp.where(ml < 0, 0, ml // chunk + 1))
        hc = jnp.maximum(nch - 1, 0)
        return nch, pltpu.make_async_copy(
            data_hbm.at[b, :, pl.ds(
                pl.multiple_of(base + hc * chunk, chunk), chunk)],
            head_buf.at[tl],
            head_sems.at[tl],
        )

    if hp:
        # issue every tile's first-needed chunk before any compute (per-tile
        # DMA latency dominates at 1-2 chunks/tile — see _fwd_kernel_hp)
        for tl in range(tpb):
            t = tg * tpb + tl
            nch, cp = head_copy(tl, t)

            @pl.when(nch > 0)
            def _():
                cp.start()

    # TPB consecutive tiles per program (grid-dispatch overhead — see
    # _fwd_kernel). Writes are drained before each tile ends, so the
    # sequential-RMW boundary argument is unchanged tile-to-tile.
    for tl in range(tpb):
        t = tg * tpb + tl
        start = starts_ref[b, t]
        count = counts_ref[b, t]
        base = (start // chunk) * chunk
        head = start - base
        total = head + count
        nchunks_all = jnp.where(count > 0, (total + chunk - 1) // chunk, 0)

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

        if hp:
            # the last chunk already rides the program-wide head prefetch;
            # pre-issue only the second-to-last for the streaming buffer
            @pl.when(nchunks > 1)
            def _():
                _data_copy(data_hbm, buf, sems, b, base, nchunks - 2,
                           (nchunks - 2) % 2, chunk).start()
        else:
            @pl.when(nchunks > 0)
            def _():
                _data_copy(data_hbm, buf, sems, b, base, nchunks - 1,
                           (nchunks - 1) % 2, chunk).start()

        def body(i, carry):
            r_carry, log_s_carry = carry
            ci = nchunks - 1 - i
            slot = ci % 2

            if hp:
                @pl.when((i >= 1) & (ci >= 1))
                def _():
                    _data_copy(data_hbm, buf, sems, b, base, ci - 1,
                               (ci - 1) % 2, chunk).start()

                @pl.when(i == 0)
                def _():
                    head_copy(tl, t)[1].wait()

                @pl.when(i > 0)
                def _():
                    _data_copy(data_hbm, buf, sems, b, base, ci, slot,
                               chunk).wait()

                use_head = i == 0
                coeff = jnp.where(use_head, head_buf[tl, 0:8], buf[slot, 0:8])
                feat = jnp.where(use_head, head_buf[tl, 8:16],
                                 buf[slot, 8:16])
            else:
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
            (jnp.zeros((1, p), jnp.float32), jnp.zeros((1, p), jnp.float32)),
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


def _bwd_tile_stream(starts_ref, counts_ref, data_hbm, featpix, tris,
                     out_ref, gout_ref, dgrad_hbm,
                     buf, dbuf, rmw_buf, sems, wsem, rsem, b, t, tl,
                     *, chunk: int, tile: int, tri_split: bool):
    """One tile's backward with per-chunk streaming reads and double-
    buffered RMW writes — the span kernel's overflow fallback. Mirrors the
    non-hp path of _bwd_kernel exactly (the span-vs-streaming bit-equality
    tests enforce that the two stay in sync)."""
    p = tile * tile
    tri_in_up, tri_ex_up = tris
    start = starts_ref[b, t]
    count = counts_ref[b, t]
    base = (start // chunk) * chunk
    head = start - base
    total = head + count
    nchunks_all = jnp.where(count > 0, (total + chunk - 1) // chunk, 0)

    gout = gout_ref[0, tl]  # [8, P]
    alpha_out = out_ref[0, tl, 4:5, :]
    last = out_ref[0, tl, 5:6, :]
    max_last = jnp.max(last).astype(jnp.int32)
    nchunks = jnp.minimum(
        nchunks_all, jnp.where(max_last < 0, 0, max_last // chunk + 1))
    log_t_stop = jnp.log(jnp.maximum(1.0 - alpha_out, 1e-12))

    def write_copy(ci, slot):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dgrad_hbm.at[b, :, pl.ds(
                pl.multiple_of(base + ci * chunk, chunk), chunk)],
            wsem.at[slot],
        )

    def write_chunk(ci, values16, have_prev):
        slot = ci % 2
        rows = jax.lax.broadcasted_iota(jnp.int32, (16, chunk), 1)
        idx = rows + ci * chunk
        mine = (idx >= head) & (idx < total)

        @pl.when(have_prev)
        def _():
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

        _data_copy(data_hbm, buf, sems, b, base, ci, slot, chunk).wait()
        coeff = buf[slot, 0:8]
        feat = buf[slot, 8:16]
        raw, alpha, log_om = _chunk_alphas(coeff, featpix, head, total,
                                           ci, chunk)
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, p), 0)
        idxf = (rows + ci * chunk).astype(jnp.float32)
        contrib = (alpha > 0.0) & (idxf <= last)
        lom = jnp.where(contrib, log_om, 0.0)
        s_incl = (_dot_tri(tri_in_up, lom, ((1,), (0,)), tri_split)
                  + log_s_carry)
        t_excl = jnp.where(contrib, jnp.exp(log_t_stop - s_incl), 0.0)
        w = alpha * t_excl

        t1 = _dot(feat, gout, ((0,), (0,)))  # [C, P]
        t1w = t1 * w
        r_rows = (_dot_tri(tri_ex_up, t1w, ((1,), (0,)), tri_split)
                  + r_carry)
        dalpha = jnp.where(
            contrib, t1 * t_excl - r_rows / (1.0 - alpha), 0.0)
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
        (jnp.zeros((1, p), jnp.float32), jnp.zeros((1, p), jnp.float32)),
    )

    @pl.when(nchunks >= 1)
    def _():
        write_copy(0, 0).wait()

    @pl.when(nchunks >= 2)
    def _():
        write_copy(1, 1).wait()


def _fwd_kernel_hp(
    starts_ref, counts_ref,  # scalar prefetch [B, NT]
    data_hbm, featpix_ref,  # inputs
    out_ref,  # output block (1, TPB, 8, P)
    buf, sems, head_buf, head_sems,  # scratch
    *, chunk: int, tile: int, tpb: int, tri_split: bool = False,
):
    """Head-prefetch forward: at 1024^2 the average tile holds 1-2 chunks,
    so per-tile first-chunk DMA latency dominates the loop (~2-3 us x 4096
    tiles). All TPB tiles' first chunks are issued up-front into dedicated
    slots; only chunks >= 1 stream through the shared double buffer."""
    b = pl.program_id(0)
    tg = pl.program_id(1)
    p = tile * tile

    featpix = featpix_ref[:]
    tri_ex = _tri(chunk, strict=True, upper=False)
    log_eps = jnp.float32(-9.22)  # log(1e-4)

    def head_copy(tl, t):
        start = starts_ref[b, t]
        base = pl.multiple_of((start // chunk) * chunk, chunk)
        return pltpu.make_async_copy(
            data_hbm.at[b, :, pl.ds(base, chunk)],
            head_buf.at[tl],
            head_sems.at[tl],
        )

    # issue every tile's first-chunk DMA before any compute
    for tl in range(tpb):
        t = tg * tpb + tl

        @pl.when(counts_ref[b, t] > 0)
        def _():
            head_copy(tl, t).start()

    for tl in range(tpb):
        t = tg * tpb + tl
        start = starts_ref[b, t]
        count = counts_ref[b, t]
        base = (start // chunk) * chunk
        head = start - base
        total = head + count
        nchunks = jnp.where(count > 0, (total + chunk - 1) // chunk, 0)

        out_ref[0, tl] = jnp.zeros((8, p), jnp.float32)

        @pl.when(nchunks > 1)
        def _():
            _data_copy(data_hbm, buf, sems, b, base, 1, 1, chunk).start()

        def cond(carry):
            ci, log_t, last = carry
            return (ci < nchunks) & (jnp.max(log_t) >= log_eps)

        def body(carry):
            ci, log_t, last = carry
            slot = ci % 2

            # chunk 1 was pre-issued before the loop; stream ci+1 for ci>=1
            @pl.when((ci >= 1) & (ci + 1 < nchunks))
            def _():
                _data_copy(data_hbm, buf, sems, b, base, ci + 1, (ci + 1) % 2,
                           chunk).start()

            # chunk 0 arrives via the program-wide head prefetch; later
            # chunks stream through the double buffer
            @pl.when(ci == 0)
            def _():
                head_copy(tl, t).wait()

            @pl.when(ci > 0)
            def _():
                _data_copy(data_hbm, buf, sems, b, base, ci, slot, chunk).wait()

            def chunk_rows(ref):
                return ref[0:8], ref[8:16]

            coeff0, feat0 = chunk_rows(head_buf[tl])
            coeffs, feats = chunk_rows(buf[slot])
            use_head = ci == 0
            coeff = jnp.where(use_head, coeff0, coeffs)
            feat = jnp.where(use_head, feat0, feats)
            raw, alpha, log_om = _chunk_alphas(coeff, featpix, head, total,
                                               ci, chunk)
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
        # drains: the head copy if the loop never ran its first iteration
        # cannot happen (log_t starts at 0 so iteration 0 always runs when
        # nchunks > 0); an early exit leaves the prefetched chunk ci_x in
        # flight for ci_x >= 1
        @pl.when((ci_x >= 1) & (ci_x < nchunks))
        def _():
            _data_copy(data_hbm, buf, sems, b, base, ci_x, ci_x % 2,
                       chunk).wait()

        out_ref[0, tl, 5:6, :] = last


def _span_of(starts_ref, counts_ref, bb, tgg, *, chunk, tpb, gran):
    """Chunk-aligned base and granule count of one program's instance span.

    Consecutive tiles' segments are exactly adjacent in the sorted compact
    instance array, so a program's TPB tiles cover ONE contiguous span
    [starts[t0], starts[t0+tpb-1] + counts[t0+tpb-1])."""
    t0 = tgg * tpb
    s0 = starts_ref[bb, t0]
    end = starts_ref[bb, t0 + tpb - 1] + counts_ref[bb, t0 + tpb - 1]
    base = (s0 // chunk) * chunk
    ng = (end - base + gran * chunk - 1) // (gran * chunk)
    return base, ng


def _span_copy(data_hbm, win, win_sems, bb, base, gi, slot, *, chunk, gran):
    gc = gran * chunk
    return pltpu.make_async_copy(
        data_hbm.at[bb, :, pl.ds(pl.multiple_of(base + gi * gc, chunk), gc)],
        win.at[slot, :, gi * gc:(gi + 1) * gc],
        win_sems.at[slot, gi],
    )


def _span_prefetch(starts_ref, counts_ref, data_hbm, win, win_sems, b, tg,
                   parity, *, chunk, tpb, gran, ngs, ntg, nbatch):
    """Cross-program span prefetch: program pid issues program pid+1's span
    granule DMAs into the other window slot while pid computes. The TPU grid
    executes sequentially and scratch persists across programs, so the next
    program finds its whole span resident (or in flight) on entry. Returns
    (own base, own granule count, fits)."""
    pid = b * ntg + tg

    def issue(bb, tgg, slot):
        base, ng = _span_of(starts_ref, counts_ref, bb, tgg, chunk=chunk,
                            tpb=tpb, gran=gran)
        for gi in range(ngs):
            @pl.when(gi < ng)
            def _():
                _span_copy(data_hbm, win, win_sems, bb, base, gi, slot,
                           chunk=chunk, gran=gran).start()

    base, ng = _span_of(starts_ref, counts_ref, b, tg, chunk=chunk, tpb=tpb,
                        gran=gran)
    fits = ng <= ngs

    # the first program self-issues (one-time latency hit)
    @pl.when((pid == 0) & fits)
    def _():
        issue(b, tg, parity)

    is_last = (b == nbatch - 1) & (tg == ntg - 1)

    @pl.when(jnp.logical_not(is_last))
    def _():
        wrap = tg == ntg - 1
        nb_ = jnp.where(wrap, b + 1, b)
        ntg_ = jnp.where(wrap, 0, tg + 1)
        ng_n = _span_of(starts_ref, counts_ref, nb_, ntg_, chunk=chunk,
                        tpb=tpb, gran=gran)[1]

        @pl.when(ng_n <= ngs)
        def _():
            issue(nb_, ntg_, 1 - parity)

    # wait for our own span (issued by the previous program, or just above)
    @pl.when(fits)
    def _():
        for gi in range(ngs):
            @pl.when(gi < ng)
            def _():
                _span_copy(data_hbm, win, win_sems, b, base, gi, parity,
                           chunk=chunk, gran=gran).wait()

    return base, ng, fits


def _fwd_kernel_span(
    starts_ref, counts_ref,  # scalar prefetch [B, NT]
    data_hbm, featpix_ref,  # inputs
    out_ref,  # output block (1, TPB, 8, P)
    win, win_sems, buf, sems,  # scratch
    *, chunk: int, tile: int, tpb: int, tri_split: bool = False,
    cap: int, gran: int, ntg: int, nbatch: int,
):
    """Span-mode forward: the program's TPB consecutive tiles read from ONE
    VMEM-resident span window prefetched by the PREVIOUS program (see
    _span_prefetch) — no per-tile DMA waits at all on the fast path. At
    1024^2 the average tile holds 1-2 chunks, so the streaming kernel's
    per-tile first-chunk DMA latency (~1-3 us x 4096 tiles) dominates; the
    span window amortizes it across the whole grid. Programs whose span
    exceeds the window fall back to the streaming path, tile by tile."""
    b = pl.program_id(0)
    tg = pl.program_id(1)
    p = tile * tile
    ngs = cap // gran

    featpix = featpix_ref[:]
    tri_ex = _tri(chunk, strict=True, upper=False)
    log_eps = jnp.float32(-9.22)  # log(1e-4)

    parity = jax.lax.rem(b * ntg + tg, 2)
    base, _, fits = _span_prefetch(
        starts_ref, counts_ref, data_hbm, win, win_sems, b, tg, parity,
        chunk=chunk, tpb=tpb, gran=gran, ngs=ngs, ntg=ntg, nbatch=nbatch)
    winp = win.at[parity]

    for tl in range(tpb):
        t = tg * tpb + tl
        out_ref[0, tl] = jnp.zeros((8, p), jnp.float32)

        @pl.when(fits)
        def _():
            start = starts_ref[b, t]
            count = counts_ref[b, t]
            tbase = (start // chunk) * chunk
            head = start - tbase
            total = head + count
            nchunks = jnp.where(count > 0, (total + chunk - 1) // chunk, 0)
            si0 = (tbase - base) // chunk

            def cond(carry):
                ci, log_t, last = carry
                return (ci < nchunks) & (jnp.max(log_t) >= log_eps)

            def body(carry):
                ci, log_t, last = carry
                blk = winp[:, pl.ds(
                    pl.multiple_of((si0 + ci) * chunk, chunk), chunk)]
                raw, alpha, log_om = _chunk_alphas(
                    blk[0:8], featpix, head, total, ci, chunk)
                cum_ex = _dot_tri(tri_ex, log_om, ((1,), (0,)), tri_split)
                t_excl = jnp.exp(log_t + cum_ex)
                t_incl = t_excl * (1.0 - alpha)
                contrib = (t_incl >= T_EPS) & (alpha > 0.0)
                w = jnp.where(contrib, alpha * t_excl, 0.0)
                out_ref[0, tl] += _dot(blk[8:16], w, ((1,), (0,)))

                rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, p), 0)
                idxf = (rows + ci * chunk).astype(jnp.float32)
                last = jnp.maximum(
                    last,
                    jnp.max(jnp.where(contrib, idxf, -1.0), axis=0,
                            keepdims=True))
                log_t_new = (log_t + cum_ex[chunk - 1 : chunk, :]
                             + log_om[chunk - 1 : chunk, :])
                return (ci + 1, log_t_new, last)

            _, _, last = jax.lax.while_loop(
                cond,
                body,
                (jnp.int32(0), jnp.zeros((1, p), jnp.float32),
                 jnp.full((1, p), -1.0, jnp.float32)),
            )
            out_ref[0, tl, 5:6, :] = last

    # overflow fallback: streaming path for ALL the program's tiles
    @pl.when(jnp.logical_not(fits))
    def _():
        for tl in range(tpb):
            _fwd_tile_stream(starts_ref, counts_ref, data_hbm, featpix,
                             tri_ex, out_ref, buf, sems, b, tg * tpb + tl, tl,
                             chunk=chunk, tile=tile, tri_split=tri_split)


def _bwd_kernel_span(
    starts_ref, counts_ref,
    data_hbm, featpix_ref, out_ref, gout_ref, dgrad_init_hbm,
    dgrad_hbm,
    win, win_sems, gwin, gw_sems, buf, dbuf, rmw_buf, sems, wsem, rsem,
    *, chunk: int, tile: int, tpb: int, tri_split: bool = False,
    cap: int, gran: int, ntg: int, nbatch: int,
):
    """Span-mode backward: reads ride the same prefetched VMEM span window
    as the forward; gradient chunks ACCUMULATE into a second VMEM span
    buffer and stream out as granule writes ONCE per program (vs one RMW
    write per chunk per tile in the streaming kernel).

    Write ordering: granule writes may overshoot into the NEXT program's
    span region (zeros — its rows will be rewritten), so every program
    waits the previous program's write semaphores before issuing its own.
    The boundary chunk a span shares with its predecessor is merged by
    reading it back after that wait (rows below the span's head keep the
    predecessor's values). The gradient span buffer is double-buffered so
    the writes drain while the next program computes; the last program
    drains its own."""
    del dgrad_init_hbm  # aliased to dgrad_hbm (pre-zeroed); never read
    b = pl.program_id(0)
    tg = pl.program_id(1)
    p = tile * tile
    ngs = cap // gran
    gc = gran * chunk

    featpix = featpix_ref[:]
    tri_in_up = _tri(chunk, strict=False, upper=True)
    tri_ex_up = _tri(chunk, strict=True, upper=True)

    pid = b * ntg + tg
    parity = jax.lax.rem(pid, 2)
    base, ng, fits = _span_prefetch(
        starts_ref, counts_ref, data_hbm, win, win_sems, b, tg, parity,
        chunk=chunk, tpb=tpb, gran=gran, ngs=ngs, ntg=ntg, nbatch=nbatch)
    winp = win.at[parity]
    gwp = gwin.at[parity]
    is_last = (b == nbatch - 1) & (tg == ntg - 1)

    def gw_copy(bb, bbase, gi, slot):
        return pltpu.make_async_copy(
            gwin.at[slot, :, gi * gc:(gi + 1) * gc],
            dgrad_hbm.at[bb, :, pl.ds(
                pl.multiple_of(bbase + gi * gc, chunk), gc)],
            gw_sems.at[slot, gi],
        )

    def wait_prev_writes():
        # the previous program's span writes must land before this program
        # reads back its boundary chunk or issues any write of its own
        @pl.when(pid > 0)
        def _():
            wrap0 = tg == 0
            pb = jnp.where(wrap0, b - 1, b)
            ptg = jnp.where(wrap0, ntg - 1, tg - 1)
            pbase, png = _span_of(starts_ref, counts_ref, pb, ptg,
                                  chunk=chunk, tpb=tpb, gran=gran)

            @pl.when(png <= ngs)  # it ran in span mode (streaming drains)
            def _():
                for gi in range(ngs):
                    @pl.when(gi < png)
                    def _():
                        gw_copy(pb, pbase, gi, 1 - parity).wait()

    @pl.when(fits)
    def _():
        gwp[:] = jnp.zeros((16, cap * chunk), jnp.float32)

        for tl in range(tpb):
            t = tg * tpb + tl
            start = starts_ref[b, t]
            count = counts_ref[b, t]
            tbase = (start // chunk) * chunk
            head = start - tbase
            total = head + count
            nchunks_all = jnp.where(
                count > 0, (total + chunk - 1) // chunk, 0)
            si0 = (tbase - base) // chunk

            gout = gout_ref[0, tl]  # [8, P]
            alpha_out = out_ref[0, tl, 4:5, :]
            last = out_ref[0, tl, 5:6, :]
            max_last = jnp.max(last).astype(jnp.int32)
            nchunks = jnp.minimum(
                nchunks_all,
                jnp.where(max_last < 0, 0, max_last // chunk + 1))
            log_t_stop = jnp.log(jnp.maximum(1.0 - alpha_out, 1e-12))

            def body(i, carry):
                r_carry, log_s_carry = carry
                ci = nchunks - 1 - i
                lane = pl.multiple_of((si0 + ci) * chunk, chunk)
                blk = winp[:, pl.ds(lane, chunk)]
                raw, alpha, log_om = _chunk_alphas(
                    blk[0:8], featpix, head, total, ci, chunk)
                rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, p), 0)
                idxf = (rows + ci * chunk).astype(jnp.float32)
                contrib = (alpha > 0.0) & (idxf <= last)
                lom = jnp.where(contrib, log_om, 0.0)
                s_incl = (_dot_tri(tri_in_up, lom, ((1,), (0,)), tri_split)
                          + log_s_carry)
                t_excl = jnp.where(contrib,
                                   jnp.exp(log_t_stop - s_incl), 0.0)
                w = alpha * t_excl

                t1 = _dot(blk[8:16], gout, ((0,), (0,)))  # [C, P]
                t1w = t1 * w
                r_rows = (_dot_tri(tri_ex_up, t1w, ((1,), (0,)), tri_split)
                          + r_carry)
                dalpha = jnp.where(
                    contrib, t1 * t_excl - r_rows / (1.0 - alpha), 0.0)
                # gradient NOT gated at the 0.99 cap (CUDA backward parity)
                dpower = jnp.where(contrib, dalpha * raw, 0.0)

                dcoeff = _dot(featpix, dpower, ((1,), (1,)))  # [8, C]
                dfeat = _dot(gout, w, ((1,), (1,)))  # [8, C]
                vals16 = jnp.concatenate([dcoeff, dfeat], axis=0)
                irows = jax.lax.broadcasted_iota(jnp.int32, (16, chunk), 1)
                idx = irows + ci * chunk
                mine = (idx >= head) & (idx < total)
                # accumulate (tiles sharing a boundary chunk own disjoint
                # rows; += keeps both)
                gwp[:, pl.ds(lane, chunk)] = (
                    gwp[:, pl.ds(lane, chunk)]
                    + jnp.where(mine, vals16, 0.0))
                return (r_rows[0:1, :] + t1w[0:1, :], s_incl[0:1, :])

            jax.lax.fori_loop(
                0, nchunks, body,
                (jnp.zeros((1, p), jnp.float32),
                 jnp.zeros((1, p), jnp.float32)),
            )

        wait_prev_writes()
        # boundary merge: rows below this span's head belong to the
        # previous program — read its (now landed) chunk back and keep them
        head0 = starts_ref[b, tg * tpb] - base

        @pl.when(head0 > 0)
        def _():
            rd = pltpu.make_async_copy(
                dgrad_hbm.at[b, :, pl.ds(pl.multiple_of(base, chunk),
                                         chunk)],
                rmw_buf,
                rsem,
            )
            rd.start()
            rd.wait()
            irows = jax.lax.broadcasted_iota(jnp.int32, (16, chunk), 1)
            gwp[:, 0:chunk] = jnp.where(irows >= head0, gwp[:, 0:chunk],
                                        rmw_buf[:])

        for gi in range(ngs):
            @pl.when(gi < ng)
            def _():
                gw_copy(b, base, gi, parity).start()

        @pl.when(is_last)
        def _():
            for gi in range(ngs):
                @pl.when(gi < ng)
                def _():
                    gw_copy(b, base, gi, parity).wait()

    # overflow fallback: streaming per-chunk RMW writes for all tiles
    @pl.when(jnp.logical_not(fits))
    def _():
        wait_prev_writes()
        for tl in range(tpb):
            _bwd_tile_stream(starts_ref, counts_ref, data_hbm, featpix,
                             (tri_in_up, tri_ex_up), out_ref, gout_ref,
                             dgrad_hbm, buf, dbuf, rmw_buf, sems, wsem, rsem,
                             b, tg * tpb + tl, tl, chunk=chunk, tile=tile,
                             tri_split=tri_split)


def _pick_tpb(nt: int) -> int:
    # largest divisor of NT <= 8: amortizes the ~us per-program dispatch
    # overhead (grid 4096 -> 512 at 1024^2) while keeping the output block
    # within VMEM (tpb * 8 * 256 * 4B = 64 KiB at tpb=8)
    for tpb in (8, 4, 2):
        if nt % tpb == 0:
            return tpb
    return 1


# span window geometry: CAP chunks of VMEM window per program (double-
# buffered for the cross-program prefetch), copied in GRAN-chunk granules.
# CAP = 48 covers 6144 instances per 8-tile program (~7x the 1024^2 bench
# scene's average span); larger spans fall back to streaming
SPAN_CAP = 48
SPAN_GRAN = 4


def _fwd_call(data, starts, counts, tile, chunk, interpret, tri="highest",
              head_prefetch=False, span=False):
    b, _, epad = data.shape
    nt = starts.shape[1]
    p = tile * tile
    tpb = _pick_tpb(nt)
    featpix = _pixel_features(tile)
    scratch = [
        pltpu.VMEM((2, 16, chunk), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    extra = {}
    if span:
        scratch = [
            pltpu.VMEM((2, 16, SPAN_CAP * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, SPAN_CAP // SPAN_GRAN)),
        ] + scratch
        kern = _fwd_kernel_span
        extra = dict(cap=SPAN_CAP, gran=SPAN_GRAN, ntg=nt // tpb, nbatch=b)
    elif head_prefetch:
        scratch += [
            pltpu.VMEM((tpb, 16, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((tpb,)),
        ]
        kern = _fwd_kernel_hp
    else:
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
                          tri_split=(tri == "split2"), **extra),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nt, 8, p), jnp.float32),
        interpret=interpret,
    )(starts, counts, data, featpix)
    return out


def _bwd_call(data, starts, counts, out, gout, tile, chunk, interpret,
              tri="highest", head_prefetch=False, span=False):
    b, _, epad = data.shape
    nt = starts.shape[1]
    p = tile * tile
    tpb = _pick_tpb(nt)
    featpix = _pixel_features(tile)
    if span:
        scratch = [
            pltpu.VMEM((2, 16, SPAN_CAP * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, SPAN_CAP // SPAN_GRAN)),
            pltpu.VMEM((2, 16, SPAN_CAP * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, SPAN_CAP // SPAN_GRAN)),
            pltpu.VMEM((2, 16, chunk), jnp.float32),
            pltpu.VMEM((2, 16, chunk), jnp.float32),
            pltpu.VMEM((16, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ]
        kern = functools.partial(
            _bwd_kernel_span, chunk=chunk, tile=tile, tpb=tpb,
            tri_split=(tri == "split2"), cap=SPAN_CAP, gran=SPAN_GRAN,
            ntg=nt // tpb, nbatch=b)
    else:
        scratch = [
            pltpu.VMEM((2, 16, chunk), jnp.float32),
            pltpu.VMEM((2, 16, chunk), jnp.float32),
            pltpu.VMEM((16, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((tpb, 16, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((tpb,)),
        ]
        kern = functools.partial(
            _bwd_kernel, chunk=chunk, tile=tile, tpb=tpb,
            tri_split=(tri == "split2"), hp=head_prefetch)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def composite_tiles(data, starts, counts, tile: int, chunk: int,
                    interpret: bool = False, tri: str = "highest",
                    head_prefetch: bool = False, span: bool = False):
    """Composite depth-sorted instance segments into per-tile accumulators.

    Args:
      data: [B, 16, EPAD] transposed instance blocks — rows 0-7 the power
        coefficients (gaussian_power_coeffs + 2 pad rows), rows 8-15 the
        features [r, g, b, depth, 1, 0, 0, 0]. EPAD must leave >= 2*chunk
        slack beyond the last live instance (window rounding); span mode
        needs >= SPAN_GRAN*chunk (granule overshoot).
      starts/counts: [B, NT] int32 UNALIGNED segment layout from binning.
    Returns:
      [B, NT, 8, P] accumulators: rows 0-2 rgb, 3 alpha-weighted depth,
      4 accumulated alpha, 5 last-contributor index (internal).
    """
    return _fwd_call(data, starts, counts, tile, chunk, interpret, tri,
                     head_prefetch, span)


def _composite_fwd(data, starts, counts, tile, chunk, interpret, tri,
                   head_prefetch, span):
    out = _fwd_call(data, starts, counts, tile, chunk, interpret, tri,
                    head_prefetch, span)
    return out, (data, starts, counts, out)


def _composite_bwd(tile, chunk, interpret, tri, head_prefetch, span, res,
                   gout):
    data, starts, counts, out = res
    dgrad = _bwd_call(data, starts, counts, out, gout, tile, chunk, interpret,
                      tri, head_prefetch, span)
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
