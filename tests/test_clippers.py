"""Clippers: quality trim, adapter masking, semialigned + overlapping ends."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.align import clippers
from isaac_aligner_tpu.aligner import Aligner, PairedAligner
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io import sam
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import batch_from_reads

L = 60


@pytest.fixture(scope="module")
def ref():
    rng = np.random.default_rng(31)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 15000))
    genome = genome_from_sequences([("chrQ", seq)])
    index = build_index(genome, seed_len=32)
    return genome, seq, index


def test_quality_trim_reference_semantics():
    # 50-base read, last 10 bases at Q2 with cutoff 25 -> trimmed
    bases = np.tile(dna.encode("ACGT" * 13)[:50], (1, 1)).copy()
    quals = np.full((1, 50), 35, np.uint8)
    quals[0, 40:] = 2
    trims = clippers.quality_trim_batch(bases, quals, 25)
    assert trims[0] == 10
    assert (bases[0, 40:] == dna.N).all()
    assert (quals[0, 40:] == 0).all()
    # high-quality read untouched
    bases2 = np.tile(dna.encode("ACGT" * 13)[:50], (1, 1)).copy()
    quals2 = np.full((1, 50), 35, np.uint8)
    assert clippers.quality_trim_batch(bases2, quals2, 25)[0] == 0
    # short reads are never trimmed (MASK_READ_LENGTH_MIN)
    b3 = np.tile(dna.encode("ACGT" * 8), (1, 1)).copy()
    q3 = np.full((1, 32), 2, np.uint8)
    assert clippers.quality_trim_batch(b3, q3, 25)[0] == 0


def test_adapter_trim():
    adapter = "AGATCGGAAGAGC"
    insert = "ACGTTGCAACGTTGCATTGACCTGAAGGTCAATGCAGGTCAAT"
    read = (insert + adapter + "ACGT")[:50]
    bases = dna.encode(read)[None, :].copy()
    quals = np.full((1, 50), 30, np.uint8)
    trims = clippers.adapter_trim_batch(bases, quals, [adapter])
    assert trims[0] == 50 - len(insert)
    assert (bases[0, len(insert):] == dna.N).all()


def test_quality_trimmed_read_soft_clipped_in_sam(ref):
    genome, seq, index = ref
    p = 3000
    read = seq[p : p + L]
    b = batch_from_reads(["qt"], [read])
    b.quals[0, 45:] = 2   # poor tail
    aligner = Aligner.create(index, read_len=L)
    rec = aligner.align_to_sam(b)[0]
    assert rec.is_mapped
    assert rec.pos == p + 1
    assert rec.cigar == "45M15S"
    assert rec.tags["NM"] == ("i", 0)


def test_quality_trimmed_reverse_read(ref):
    genome, seq, index = ref
    p = 5000
    read = dna.decode(dna.revcomp(dna.encode(seq[p : p + L])))
    b = batch_from_reads(["qtr"], [read])
    b.quals[0, 45:] = 2   # read-end tail == genome-left side
    rec = Aligner.create(index, read_len=L).align_to_sam(b)[0]
    assert rec.is_mapped
    assert rec.flag & sam.FLAG_REVERSE
    assert rec.cigar == "15S45M"
    assert rec.pos == p + 15 + 1


def test_semialigned_ends_clipped(ref):
    genome, seq, index = ref
    p = 7000
    read = list(seq[p : p + L])
    # wreck the tail (garbage junction): mismatches at 53,55,57,59 leave
    # the first 5-in-a-row matches ending at 52 -> clip the last 7 bases
    # (the 60bp read only fits one 32-mer seed, which must stay clean)
    for j in (53, 55, 57, 59):
        read[j] = "A" if read[j] != "A" else "C"
    b = batch_from_reads(["semi"], ["".join(read)])
    rec = Aligner.create(index, read_len=L).align_to_sam(b)[0]
    assert rec.is_mapped
    assert rec.cigar == f"{L - 7}M7S", rec.cigar
    assert rec.pos == p + 1
    assert rec.tags["NM"] == ("i", 0)   # clipped mismatches leave NM


def test_overlapping_pair_ends_clipped(ref):
    genome, seq, index = ref
    p = 9000
    tlen = 80   # reads of 60 overlap by 40
    r1 = seq[p : p + L]
    r2 = dna.decode(dna.revcomp(dna.encode(seq[p + tlen - L : p + tlen])))
    b1 = batch_from_reads(["ov"], [r1])
    b2 = batch_from_reads(["ov"], [r2])
    b1.quals[0, :] = 35   # read 1 better quality (both above trim cutoff)
    b2.quals[0, :] = 30   # -> read 2's overlap gets clipped
    aligner = PairedAligner.create(index, read_len=L)
    from isaac_aligner_tpu.align.pairs import TlsStatic
    aligner.tls = TlsStatic(min=60, max=120, mate_min=60, mate_max=120,
                            best0=1, best1=6)
    res = aligner.align_batch_arrays(b1, b2)
    overlap = (p + L) - (p + tlen - L)
    assert res["cigar_2"][0] == f"{overlap}S{L - overlap}M"
    assert res["start_2"][0] == p + tlen - L + overlap
    assert res["cigar_1"][0] is None  # left read untouched


def _legacy_quality_trim(bases, quals, cutoff, tail_masked=None):
    """Round-1 scalar implementation (oracle for the vectorized one)."""
    from isaac_aligner_tpu import dna
    from isaac_aligner_tpu.align.clippers import MASK_READ_LENGTH_MIN
    b, l = bases.shape
    trims = np.zeros(b, np.int32)
    if cutoff <= 0 or l < MASK_READ_LENGTH_MIN:
        return trims
    for i in range(b):
        qs = peak = trim = 0
        start_j = l - 1 - (int(tail_masked[i]) if tail_masked is not None else 0)
        for j in range(start_j, MASK_READ_LENGTH_MIN - 1, -1):
            qs += cutoff - int(quals[i, j])
            if qs < 0:
                break
            if qs > peak:
                peak = qs
                trim = start_j + 1 - j
        if trim:
            trims[i] = trim
            bases[i, start_j + 1 - trim :] = dna.N
            quals[i, start_j + 1 - trim :] = 0
    return trims


def test_quality_trim_vectorized_matches_legacy():
    from isaac_aligner_tpu.align.clippers import quality_trim_batch
    rng = np.random.default_rng(7)
    for trial in range(5):
        b, l = 64, 80
        bases = rng.integers(0, 4, (b, l)).astype(np.uint8)
        quals = rng.integers(2, 41, (b, l)).astype(np.uint8)
        # noisy tails to force varied trim outcomes
        quals[:, 60:] = rng.integers(2, 30, (b, l - 60))
        tm = rng.integers(0, 12, b).astype(np.int32) if trial % 2 else None
        if tm is not None:
            # the real pipeline masks adapter tails BEFORE the walk
            for i in range(b):
                if tm[i]:
                    bases[i, l - tm[i]:] = 4
                    quals[i, l - tm[i]:] = 0
        b1, q1 = bases.copy(), quals.copy()
        b2, q2 = bases.copy(), quals.copy()
        want = _legacy_quality_trim(b1, q1, 25, tm)
        got = quality_trim_batch(b2, q2, 25, tail_masked=tm)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(q1, q2)


def test_semialigned_vectorized_matches_legacy_scan():
    """Randomized: the vectorized 5-consecutive-match clip must match a
    direct transcription of the reference scan."""
    from isaac_aligner_tpu.align.clippers import (CONSECUTIVE_MATCHES_MIN,
                                                  clip_semialigned)
    rng = np.random.default_rng(9)
    g = rng.integers(0, 4, 4000).astype(np.uint8)
    n, l = 48, 60
    starts = rng.integers(50, 3800, n)
    bases = np.stack([g[s : s + l] for s in starts]).astype(np.uint8)
    # corrupt some heads/tails
    for i in range(n):
        k = int(rng.integers(0, 12))
        if i % 3 == 0:
            bases[i, :k] = rng.integers(0, 4, k)
        if i % 3 == 1:
            bases[i, l - k :] = rng.integers(0, 4, k)

    def legacy(seq, start):
        ref = g[start : start + l]
        match = (seq == 4) | ((seq == ref) & (ref != 4))

        def scan(m):
            run = 0
            for j, ok in enumerate(m):
                run = run + 1 if ok else 0
                if run == CONSECUTIVE_MATCHES_MIN:
                    return j - CONSECUTIVE_MATCHES_MIN + 1
            return 0
        lc, rc_ = scan(match), scan(match[::-1])
        if lc == 0 and rc_ == 0:
            return None
        if lc + rc_ + CONSECUTIVE_MATCHES_MIN >= l:
            return None
        rm = int((~match[:lc]).sum() + (~match[l - rc_ :]).sum())
        return lc, rc_, rm

    res = {"aligned": np.ones(n, bool), "start": starts.astype(np.int64),
           "reverse": np.zeros(n, bool),
           "edit_distance": np.full(n, 20, np.int64),
           "mismatches": np.full(n, 20, np.int64)}
    clip_semialigned(res, "", g, bases)
    for i in range(n):
        want = legacy(bases[i], int(starts[i]))
        if want is None:
            assert res["cigar"][i] is None, i
            assert res["start"][i] == starts[i]
        else:
            lc, rc_, rm = want
            parts = ([f"{lc}S"] if lc else []) + [f"{l - lc - rc_}M"] + \
                ([f"{rc_}S"] if rc_ else [])
            assert res["cigar"][i] == "".join(parts), (i, res["cigar"][i], want)
            assert res["start"][i] == starts[i] + lc
            assert res["edit_distance"][i] == 20 - rm
