import numpy as np
import jax.numpy as jnp

from isaac_aligner_tpu.index.build import bias_u32_to_i32
from isaac_aligner_tpu.ops import search


def _ranges_numpy(keys_u64, queries_u64):
    lo = np.searchsorted(keys_u64, queries_u64, side="left")
    hi = np.searchsorted(keys_u64, queries_u64, side="right")
    return lo, hi - lo


def _split_biased(u64s):
    hi = (u64s >> 32).astype(np.uint32)
    lo = (u64s & 0xFFFFFFFF).astype(np.uint32)
    return bias_u32_to_i32(hi), bias_u32_to_i32(lo)


def test_sorted_range_matches_numpy_searchsorted():
    rng = np.random.default_rng(42)
    keys = np.sort(rng.integers(0, 2**64, 1000, dtype=np.uint64))
    # mix of present and absent queries, including extremes
    queries = np.concatenate([
        rng.choice(keys, 50),
        rng.integers(0, 2**64, 50, dtype=np.uint64),
        np.array([0, 2**64 - 1], dtype=np.uint64),
        keys[:1], keys[-1:],
    ])
    exp_begin, exp_count = _ranges_numpy(keys, queries)

    n = len(keys)
    n_pad = search.pad_pow2(n)
    k_hi, k_lo = _split_biased(keys)
    i32max = np.int32(2**31 - 1)
    k_hi = np.concatenate([k_hi, np.full(n_pad - n, i32max, np.int32)])
    k_lo = np.concatenate([k_lo, np.full(n_pad - n, i32max, np.int32)])
    q_hi, q_lo = _split_biased(queries)

    begin, count = search.sorted_range(
        jnp.asarray(k_hi), jnp.asarray(k_lo),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.int32(n))
    assert np.array_equal(np.asarray(begin), exp_begin)
    assert np.array_equal(np.asarray(count), exp_count)


def test_sorted_range_duplicates():
    keys = np.array([5, 5, 5, 7, 9, 9], dtype=np.uint64)
    queries = np.array([4, 5, 6, 7, 8, 9, 10], dtype=np.uint64)
    exp_begin, exp_count = _ranges_numpy(keys, queries)
    n_pad = search.pad_pow2(len(keys))
    k_hi, k_lo = _split_biased(keys)
    i32max = np.int32(2**31 - 1)
    pad = n_pad - len(keys)
    k_hi = np.concatenate([k_hi, np.full(pad, i32max, np.int32)])
    k_lo = np.concatenate([k_lo, np.full(pad, i32max, np.int32)])
    q_hi, q_lo = _split_biased(queries)
    begin, count = search.sorted_range(
        jnp.asarray(k_hi), jnp.asarray(k_lo),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.int32(len(keys)))
    assert np.array_equal(np.asarray(begin), exp_begin)
    assert np.array_equal(np.asarray(count), exp_count)


def test_sorted_range_all_max_key_query():
    # the all-ones key collides with the padding sentinel — count must
    # reflect only real records
    keys = np.array([1, 2**64 - 1, 2**64 - 1], dtype=np.uint64)
    queries = np.array([2**64 - 1], dtype=np.uint64)
    n_pad = search.pad_pow2(len(keys))
    k_hi, k_lo = _split_biased(keys)
    i32max = np.int32(2**31 - 1)
    pad = n_pad - len(keys)
    k_hi = np.concatenate([k_hi, np.full(pad, i32max, np.int32)])
    k_lo = np.concatenate([k_lo, np.full(pad, i32max, np.int32)])
    q_hi, q_lo = _split_biased(queries)
    begin, count = search.sorted_range(
        jnp.asarray(k_hi), jnp.asarray(k_lo),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.int32(len(keys)))
    assert int(begin[0]) == 1
    assert int(count[0]) == 2
