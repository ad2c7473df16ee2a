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


def test_bucketed_search_matches_plain():
    """sorted_range_bucketed must agree with sorted_range on every query
    (prefix-bucket table = reference maskWidth sharding as O(1) lookup)."""
    import numpy as np
    from isaac_aligner_tpu.align.pipeline import (BUCKET_WIDTH,
                                                  build_bucket_table)
    from isaac_aligner_tpu.index.build import bias_u32_to_i32
    from isaac_aligner_tpu.ops import search

    rng = np.random.default_rng(0)
    n = 5000
    # heavy duplication to exercise ranges; keys sorted by (hi, lo)
    hi = np.sort(rng.integers(0, 2**32, n, dtype=np.uint64)).astype(np.uint32)
    lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    hi_i, lo_i = bias_u32_to_i32(hi), bias_u32_to_i32(lo)

    n_pad = search.pad_pow2(n)
    i32max = np.int32(2**31 - 1)
    key_hi = np.concatenate([hi_i, np.full(n_pad - n, i32max, np.int32)])
    key_lo = np.concatenate([lo_i, np.full(n_pad - n, i32max, np.int32)])

    starts, log2 = build_bucket_table(hi_i)
    # queries: half real keys, half random probes
    qi = rng.integers(0, n, 64)
    q_hi = np.concatenate([hi_i[qi], bias_u32_to_i32(
        rng.integers(0, 2**32, 64, dtype=np.uint64).astype(np.uint32))])
    q_lo = np.concatenate([lo_i[qi], bias_u32_to_i32(
        rng.integers(0, 2**32, 64, dtype=np.uint64).astype(np.uint32))])

    import jax.numpy as jnp
    kh, kl = jnp.asarray(key_hi), jnp.asarray(key_lo)
    qh, ql = jnp.asarray(q_hi.astype(np.int32)), jnp.asarray(q_lo.astype(np.int32))
    b0, c0 = search.sorted_range(kh, kl, qh, ql, jnp.int32(n))
    b1, c1 = search.sorted_range_bucketed(kh, kl, qh, ql, jnp.int32(n),
                                          jnp.asarray(starts), BUCKET_WIDTH,
                                          log2)
    np.testing.assert_array_equal(np.array(b0), np.array(b1))
    np.testing.assert_array_equal(np.array(c0), np.array(c1))


def test_bucketed_search_count_cap():
    """Capped-count variant: counts saturate at 2^cap, lower bound exact."""
    import numpy as np
    from isaac_aligner_tpu.align.pipeline import (BUCKET_WIDTH,
                                                  build_bucket_table)
    from isaac_aligner_tpu.index.build import bias_u32_to_i32
    from isaac_aligner_tpu.ops import search
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    # few distinct keys => large equal runs to saturate the cap
    n = 4096
    hi = np.sort(rng.integers(0, 50, n, dtype=np.uint64)).astype(np.uint32) << 26
    lo = np.sort(rng.integers(0, 8, n, dtype=np.uint64)).astype(np.uint32)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    hi_i, lo_i = bias_u32_to_i32(hi), bias_u32_to_i32(lo)
    n_pad = search.pad_pow2(n)
    i32max = np.int32(2**31 - 1)
    key_hi = np.concatenate([hi_i, np.full(n_pad - n, i32max, np.int32)])
    key_lo = np.concatenate([lo_i, np.full(n_pad - n, i32max, np.int32)])
    starts, log2 = build_bucket_table(hi_i)

    qi = rng.integers(0, n, 128)
    kh, kl = jnp.asarray(key_hi), jnp.asarray(key_lo)
    qh, ql = jnp.asarray(hi_i[qi]), jnp.asarray(lo_i[qi])
    b_full, c_full = search.sorted_range(kh, kl, qh, ql, jnp.int32(n))
    b_cap, c_cap = search.sorted_range_bucketed(
        kh, kl, qh, ql, jnp.int32(n), jnp.asarray(starts), BUCKET_WIDTH,
        log2, count_cap_log2=4)
    np.testing.assert_array_equal(np.array(b_full), np.array(b_cap))
    np.testing.assert_array_equal(np.minimum(np.array(c_full), 16),
                                  np.array(c_cap))
