"""Banded Smith-Waterman kernel vs the numpy oracle and known CIGARs."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.ops import sw


def _codes(s):
    return dna.encode(s)


def _align_one(query, db, scores=sw.BWA_SCORES):
    """Helper: run kernel on one pair, return (score, cigar, first_db)."""
    g, tb = sw.banded_sw(np.asarray([query]), np.asarray([db]), scores)
    g = np.asarray(g)[0]
    tb = np.asarray(tb)[0]
    exit_d = int(np.argmax(g))
    ops, first_db = sw.traceback(tb, exit_d, len(query))
    return float(g[exit_d]), sw.ops_to_cigar(ops), first_db


def _window_for(ref, pos, read_len):
    """BAND-1 extra bases, split 7 left / 8 right like reference getFlanks."""
    left = min(7, pos)
    db = ref[pos - left : pos - left + read_len + sw.BAND - 1]
    return db, left


def test_kernel_matches_numpy_oracle_random():
    rng = np.random.default_rng(0)
    n, l = 16, 40
    q = rng.integers(0, 4, (n, l)).astype(np.int32)
    db = rng.integers(0, 4, (n, l + sw.BAND - 1)).astype(np.int32)
    g, tb = sw.banded_sw(q, db)
    g = np.asarray(g)
    tb = np.asarray(tb)
    for i in range(n):
        g_ref, tb_ref = sw.banded_sw_numpy(q[i], db[i])
        np.testing.assert_allclose(g[i], g_ref, rtol=0, atol=1e-3,
                                   err_msg=f"pair {i}")
        np.testing.assert_array_equal(tb[i], tb_ref, err_msg=f"pair {i}")


def test_perfect_match_cigar():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 4, 200).astype(np.int32)
    read = ref[50:90].copy()
    db, left = _window_for(ref, 50, 40)
    score, cigar, first_db = _align_one(read, db)
    assert cigar == [(40, "M")]
    assert first_db == left  # alignment starts exactly at pos
    assert score == 0.0      # bwa scoring: match == 0


def test_deletion_cigar():
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 4, 300).astype(np.int32)
    # read = ref[100:120] + ref[125:145]  (5-base deletion in read)
    read = np.concatenate([ref[100:120], ref[125:145]])
    db, left = _window_for(ref, 100, 40)
    score, cigar, first_db = _align_one(read, db)
    assert cigar == [(20, "M"), (5, "D"), (20, "M")], cigar
    assert first_db == left
    # bwa: open -11, extend -4 per extra base
    assert score == -11 - 4 * 4


def test_insertion_cigar():
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 4, 300).astype(np.int32)
    # read has 3 inserted bases after 18 matched
    ins = rng.integers(0, 4, 3)
    read = np.concatenate([ref[100:118], ins, ref[118:137]])  # 40 bases
    db, left = _window_for(ref, 100, 40)
    score, cigar, first_db = _align_one(read, db)
    # insertion content may accidentally match; accept either exact cigar
    # or a higher-scoring equivalent, but the common case is clean:
    if cigar == [(18, "M"), (3, "I"), (19, "M")]:
        assert score == -11 - 4 * 2
    else:
        # whatever the kernel chose must score at least as well
        assert score >= -11 - 4 * 2


def test_mismatches_no_gap():
    rng = np.random.default_rng(4)
    ref = rng.integers(0, 4, 300).astype(np.int32)
    read = ref[60:100].copy()
    read[10] = (read[10] + 1) % 4
    read[30] = (read[30] + 2) % 4
    db, left = _window_for(ref, 60, 40)
    score, cigar, first_db = _align_one(read, db)
    assert cigar == [(40, "M")]
    assert score == -3 * 2


def test_eland_scoring_variant():
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 300).astype(np.int32)
    read = ref[30:70].copy()
    db, left = _window_for(ref, 30, 40)
    score, cigar, _ = _align_one(read, db, scores=sw.ELAND_SCORES)
    assert cigar == [(40, "M")]
    assert score == 2.0 * 40
