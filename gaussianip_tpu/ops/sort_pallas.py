"""VMEM-resident bitonic (key, value) sort for the binning hot path.

Why: the splat binning's `jax.lax.sort` over ~450k (key, gid) int32 pairs is
the largest single bucket of the 1024^2 render forward (r4 probe_cut /
probe_binparts). XLA lowers sort to a compare-exchange network whose stages
round-trip HBM; at ~4 MB the whole working set fits in VMEM (~16 MB/core),
so a Pallas bitonic network runs the same O(n log^2 n) stages at VPU speed
with zero HBM traffic between stages.

Layout trick (everything stays sublane-aligned):

  The flat index i of the padded pow2 array N = S*128 is split i = c*S + r
  (r = i mod S, c = i div S):

    * SMALL layout  X[r, c] : [S, 128]  — a compare-exchange of stride
      j <= S/2 XORs a bit of r -> a SUBLANE-dim regroup (reshape dim 0);
    * BIG layout    Y[c, r] : [128, S]  — stride j >= S XORs a bit of
      c -> a SUBLANE-dim regroup of Y.

  Mosaic handles sublane reshapes/selects natively; the lane dim (last,
  128-aligned) is never shuffled. Switching layouts is one XLA transpose in
  HBM (~2 MB each; 14 switches for N = 2^19 ~= 0.1 ms total).

The network is the standard bitonic sort: phases k = 2, 4, ..., N; strides
j = k/2, ..., 1; ascending iff (i & k) == 0; final phase fully ascending.
Equal keys keep no particular order (matches lax.sort(is_stable=False),
which is the production binning configuration).

Replaces (not copies) the CUDA radix sort inside diff-gaussian-
rasterization (consumed at reference:
gaussiansplatting/gaussian_renderer/__init__.py:85-93).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
MAX_I32 = jnp.iinfo(jnp.int32).max


def _phases(n: int):
    """[(k, j)] bitonic stage list for pow2 n."""
    out = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            out.append((k, j))
            j //= 2
        k *= 2
    return out


def _runs(n: int, s: int):
    """Group the stage list into maximal same-layout runs.

    SMALL handles j < s (bit of r), BIG handles j >= s (bit of c)."""
    runs = []
    for k, j in _phases(n):
        lay = "big" if j >= s else "small"
        if not runs or runs[-1][0] != lay:
            runs.append((lay, []))
        runs[-1][1].append((k, j))
    return runs


def _stage(key, val, k: int, j: int, lay: str, s: int):
    """One compare-exchange stage on [S,128] (small) / [128,S] (big)."""
    if lay == "small":
        m = j  # XOR bit inside r (dim 0 of [S, 128])
        pair_shape = (s // (2 * m), m, LANE)
    else:
        m = j // s  # XOR bit inside c (dim 0 of [128, S])
        pair_shape = (LANE // (2 * m), m, s)
    k4 = key.reshape(pair_shape[0], 2, pair_shape[1], pair_shape[2])
    v4 = val.reshape(pair_shape[0], 2, pair_shape[1], pair_shape[2])
    ak, bk = k4[:, 0], k4[:, 1]
    av, bv = v4[:, 0], v4[:, 1]

    # ascending iff (i & k) == 0; locate bit k in (r, c) for this layout
    if k >= s * LANE:
        asc = None  # final phase: bit above the index range -> ascending
    elif lay == "small":
        if k < s:
            # bit of r; k >= 2j = 2m so it lives in the outer part o*2m
            asc = (jax.lax.broadcasted_iota(jnp.int32, pair_shape, 0)
                   * (2 * m)) & k == 0
        else:  # bit of c (the lane dim)
            asc = (jax.lax.broadcasted_iota(jnp.int32, pair_shape, 2)
                   & (k // s)) == 0
    else:
        # big layout [128//2m, 2, m, S]; k > j >= s so kk = k//s >= 2m:
        # the bit lives in the outer part of c = o*2m + h*m + t
        asc = (jax.lax.broadcasted_iota(jnp.int32, pair_shape, 0)
               * (2 * m)) & (k // s) == 0

    gt = ak > bk
    swap = gt if asc is None else jnp.where(asc, gt, ak < bk)
    nak = jnp.where(swap, bk, ak)
    nbk = jnp.where(swap, ak, bk)
    nav = jnp.where(swap, bv, av)
    nbv = jnp.where(swap, av, bv)
    nk = jnp.stack([nak, nbk], axis=1).reshape(key.shape)
    nv = jnp.stack([nav, nbv], axis=1).reshape(val.shape)
    return nk, nv


def _make_run_kernel(lay: str, stages, s: int):
    def kernel(key_ref, val_ref, key_out, val_out):
        key = key_ref[:]
        val = val_ref[:]
        for k, j in stages:
            key, val = _stage(key, val, k, j, lay, s)
        key_out[:] = key
        val_out[:] = val

    return kernel


def _run_call(x_key, x_val, lay: str, stages, s: int, interpret: bool):
    shape = x_key.shape
    kern = _make_run_kernel(lay, tuple(stages), s)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(shape, jnp.int32),
                   jax.ShapeDtypeStruct(shape, jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(x_key, x_val)


@functools.partial(jax.jit, static_argnames=("pad_key", "pad_val",
                                             "interpret", "max_s"))
def sort_pairs_pallas(keys, vals, *, pad_key: int = MAX_I32,
                      pad_val: int = 0, interpret: bool = False,
                      max_s: int = 8192):
    """Ascending (keys, vals) sort of 1-D int32 arrays (not stable).

    Pads to the next power of two with `pad_key`. Live keys EQUAL to
    `pad_key` may interleave with the padding (unstable network), so their
    values can be lost off the sliced tail — `pad_key` must compare
    strictly greater than every live key, or equal only to keys whose
    values the caller never reads (dead/sentinel slots). Falls back to
    `jax.lax.sort` when the problem is too small (< 1024) or too large for
    VMEM residency (S > max_s)."""
    assert keys.ndim == 1 and keys.dtype == jnp.int32, keys
    e = keys.shape[0]
    n = 1 << max(e - 1, 1).bit_length()
    s = n // LANE
    if s < 8 or s > max_s:
        ks, vs = jax.lax.sort((keys, vals), num_keys=1, is_stable=False)
        return ks, vs
    kp = jnp.pad(keys, (0, n - e), constant_values=pad_key)
    vp = jnp.pad(vals.astype(jnp.int32), (0, n - e), constant_values=pad_val)
    # SMALL layout X[r, c] = flat[c*S + r]; BIG layout Y[c, r] is the free
    # reshape of flat -> [128, S]
    big_k = kp.reshape(LANE, s)
    big_v = vp.reshape(LANE, s)
    cur_lay = "big"
    for lay, stages in _runs(n, s):
        if lay != cur_lay:
            big_k = big_k.T  # [128,S] <-> [S,128] (one XLA transpose in HBM)
            big_v = big_v.T
            cur_lay = lay
        big_k, big_v = _run_call(big_k, big_v, lay, stages, s, interpret)
    if cur_lay == "small":
        big_k = big_k.T
        big_v = big_v.T
    return big_k.reshape(-1)[:e], big_v.reshape(-1)[:e]
