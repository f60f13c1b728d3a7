"""VMEM bitonic (key, value) sort vs lax.sort (binning hot path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianip_tpu.ops.sort_pallas import sort_pairs_pallas, _phases, _runs


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _check(keys, vals, **kw):
    ks, vs = sort_pairs_pallas(jnp.asarray(keys), jnp.asarray(vals),
                               interpret=True, **kw)
    ks, vs = np.asarray(ks), np.asarray(vs)
    ref_k = np.sort(keys, kind="stable")
    np.testing.assert_array_equal(ks, ref_k)
    # values travel with their keys: the (key, val) multiset must be
    # preserved and every val must sit beside its own key
    got = np.stack([ks, vs], 1)
    ref = np.stack([keys, vals], 1)
    got_sorted = got[np.lexsort((got[:, 1], got[:, 0]))]
    ref_sorted = ref[np.lexsort((ref[:, 1], ref[:, 0]))]
    np.testing.assert_array_equal(got_sorted, ref_sorted)


def test_stage_list_is_complete_bitonic():
    n = 1 << 14
    stages = _phases(n)
    assert len(stages) == 14 * 15 // 2
    s = n // 128
    runs = _runs(n, s)
    assert sum(len(r[1]) for r in runs) == len(stages)
    # layouts only flip between runs, never inside one
    for lay, st in runs:
        for k, j in st:
            assert (j >= s) == (lay == "big")


def test_sort_random_pow2(rng):
    n = 1 << 12  # S = 32
    keys = rng.integers(0, 1 << 28, n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)
    _check(keys, vals)


def test_sort_random_non_pow2(rng):
    e = 3000
    keys = rng.integers(0, 1 << 28, e).astype(np.int32)
    vals = rng.integers(0, 1 << 30, e).astype(np.int32)
    _check(keys, vals)


def test_sort_with_heavy_duplicates(rng):
    e = 5000
    keys = rng.integers(0, 64, e).astype(np.int32)  # heavy duplication
    vals = np.arange(e, dtype=np.int32)
    _check(keys, vals)


def test_live_sentinels_key_order_only(rng):
    # live keys EQUAL to pad_key may interleave with padding: keys still
    # sort correctly; their values are interchangeable by contract
    e = 5000
    keys = rng.integers(0, 1 << 20, e).astype(np.int32)
    keys[::7] = np.iinfo(np.int32).max
    vals = np.arange(e, dtype=np.int32)
    ks, vs = sort_pairs_pallas(jnp.asarray(keys), jnp.asarray(vals),
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), np.sort(keys))
    live = keys < np.iinfo(np.int32).max
    got_live = np.asarray(vs)[np.asarray(ks) < np.iinfo(np.int32).max]
    ref = np.stack([keys[live], vals[live]], 1)
    got = np.stack([np.sort(keys)[: live.sum()], got_live], 1)
    np.testing.assert_array_equal(got[np.lexsort((got[:, 1], got[:, 0]))],
                                  ref[np.lexsort((ref[:, 1], ref[:, 0]))])


def test_sort_binning_shaped_keys(rng):
    # tile<<16 | q16 keys like production binning
    e = 9000
    tiles = rng.integers(0, 4096, e).astype(np.int32)
    q16 = rng.integers(0, 65536, e).astype(np.int32)
    keys = (tiles << 16) | q16
    vals = rng.integers(0, 100_000, e).astype(np.int32)
    _check(keys, vals)


def test_small_input_falls_back():
    keys = jnp.asarray([3, 1, 2], jnp.int32)
    vals = jnp.asarray([0, 1, 2], jnp.int32)
    ks, vs = sort_pairs_pallas(keys, vals, interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(vs), [1, 2, 0])


def test_matches_lax_sort_pairs(rng):
    e = 4096
    keys = rng.integers(0, 1 << 20, e).astype(np.int32)
    vals = np.arange(e, dtype=np.int32)
    ks, vs = sort_pairs_pallas(jnp.asarray(keys), jnp.asarray(vals),
                               interpret=True)
    lk, lv = jax.lax.sort((jnp.asarray(keys), jnp.asarray(vals)), num_keys=1)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(lk))
    # unique keys here with probability ~1 -> vals must match exactly too
    if len(np.unique(keys)) == e:
        np.testing.assert_array_equal(np.asarray(vs), np.asarray(lv))
