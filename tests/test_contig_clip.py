"""Contig-end clipping: alignments overhanging contig/genome edges
soft-clip instead of going unmapped (reference AlignerBase.cpp:121-231;
round-1 review: reads overlapping contig ends were silently unalignable)."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.aligner import Aligner
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import batch_from_reads

READ_LEN = 64


@pytest.fixture(scope="module")
def ref():
    rng = np.random.default_rng(33)
    a = "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
    b = "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
    genome = genome_from_sequences([("cA", a), ("cB", b)])
    return genome, a, b, build_index(genome, seed_len=32)


def _junk(n, seed=1):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def test_right_edge_clip(ref):
    genome, a, b, index = ref
    aligner = Aligner.create(index, read_len=READ_LEN)
    # read runs off the end of contig A: 54 real bases + 10 junk
    read = a[-54:] + _junk(10)
    recs = aligner.align_to_sam(batch_from_reads(["r"], [read]))
    r = recs[0]
    assert r.is_mapped, r
    assert r.rname == "cA"
    assert r.pos == 5000 - 54 + 1
    assert r.cigar == "54M10S", r.cigar
    assert r.tags["NM"] == ("i", 0)


def test_left_edge_clip_second_contig(ref):
    genome, a, b, index = ref
    aligner = Aligner.create(index, read_len=READ_LEN)
    # read hangs 12 bases left of contig B's start
    read = _junk(12, seed=2) + b[:52]
    recs = aligner.align_to_sam(batch_from_reads(["r"], [read]))
    r = recs[0]
    assert r.is_mapped, r
    assert r.rname == "cB"
    assert r.pos == 1
    assert r.cigar == "12S52M", r.cigar
    assert r.tags["NM"] == ("i", 0)


def test_left_edge_clip_genome_head(ref):
    genome, a, b, index = ref
    aligner = Aligner.create(index, read_len=READ_LEN)
    # read hangs left off position 0 of the whole genome (negative start)
    read = _junk(8, seed=3) + a[:56]
    recs = aligner.align_to_sam(batch_from_reads(["r"], [read]))
    r = recs[0]
    assert r.is_mapped, r
    assert r.rname == "cA"
    assert r.pos == 1
    assert r.cigar == "8S56M", r.cigar


def test_reverse_strand_edge_clip(ref):
    genome, a, b, index = ref
    aligner = Aligner.create(index, read_len=READ_LEN)
    # reverse-complement read overhanging contig B's right edge
    fwd = b[-50:] + _junk(14, seed=4)
    read = dna.decode(dna.revcomp(dna.encode(fwd)))
    recs = aligner.align_to_sam(batch_from_reads(["r"], [read]))
    r = recs[0]
    assert r.is_mapped and (r.flag & 16), r
    assert r.rname == "cB"
    assert r.pos == 5000 - 50 + 1
    assert r.cigar == "50M14S", r.cigar


def test_interior_reads_unaffected(ref):
    genome, a, b, index = ref
    aligner = Aligner.create(index, read_len=READ_LEN)
    reads = [a[100:164], b[2000:2064]]
    recs = aligner.align_to_sam(batch_from_reads(["i0", "i1"], reads))
    assert recs[0].pos == 101 and recs[0].cigar == "64M"
    assert recs[1].pos == 2001 and recs[1].cigar == "64M"
    assert recs[0].mapq > 30 and recs[1].mapq > 30


def test_over_half_overhang_stays_unmapped(ref):
    genome, a, b, index = ref
    aligner = Aligner.create(index, read_len=READ_LEN)
    # only 20 in-contig bases (< read_len//2 + 1): rejected
    read = a[-20:] + _junk(44, seed=5)
    recs = aligner.align_to_sam(batch_from_reads(["r"], [read]))
    assert not recs[0].is_mapped
