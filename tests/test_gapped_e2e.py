"""End-to-end gapped alignment (config 3 of the BASELINE ladder: indel
reads get banded-SW CIGARs)."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.aligner import Aligner
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import batch_from_reads

READ_LEN = 80


@pytest.fixture(scope="module")
def ref():
    rng = np.random.default_rng(77)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 12000))
    genome = genome_from_sequences([("chrG", seq)])
    index = build_index(genome, seed_len=32)
    return genome, seq, index


def test_deletion_read(ref):
    genome, seq, index = ref
    p = 2000
    # read skips 6 reference bases after 40: seeds at offset 0/32 span the
    # deletion for seed1... seed0 (0..31) is clean
    read = seq[p : p + 40] + seq[p + 46 : p + 46 + READ_LEN - 40]
    batch = batch_from_reads(["del6"], [read])
    aligner = Aligner.create(index, read_len=READ_LEN)
    recs = aligner.align_to_sam(batch)
    rec = recs[0]
    assert rec.is_mapped
    assert rec.pos == p + 1
    assert rec.cigar == "40M6D40M", rec.cigar
    assert rec.tags["NM"] == ("i", 6)


def test_insertion_read(ref):
    genome, seq, index = ref
    p = 5000
    ins = "TTTTT"
    read = seq[p : p + 40] + ins + seq[p + 40 : p + 40 + READ_LEN - 45]
    batch = batch_from_reads(["ins5"], [read])
    aligner = Aligner.create(index, read_len=READ_LEN)
    recs = aligner.align_to_sam(batch)
    rec = recs[0]
    assert rec.is_mapped
    assert rec.pos == p + 1
    # left-shifted equivalents are equal-scoring and acceptable
    assert rec.cigar in ("40M5I35M", "39M5I36M"), rec.cigar
    assert rec.tags["NM"] == ("i", 5)
    assert rec.mapq >= 40  # rescored after polish


def test_reverse_strand_deletion(ref):
    genome, seq, index = ref
    p = 8000
    fwd = seq[p : p + 40] + seq[p + 44 : p + 44 + READ_LEN - 40]
    read = dna.decode(dna.revcomp(dna.encode(fwd)))
    batch = batch_from_reads(["rdel"], [read])
    aligner = Aligner.create(index, read_len=READ_LEN)
    recs = aligner.align_to_sam(batch)
    rec = recs[0]
    assert rec.is_mapped
    assert rec.flag & 0x10
    assert rec.pos == p + 1
    # the 3 bases before the gap repeat at the far side, so the deletion
    # is ambiguous; the kernel left-aligns (SAM convention)
    assert rec.cigar in ("40M4D40M", "37M4D43M"), rec.cigar


def test_clean_read_stays_ungapped(ref):
    genome, seq, index = ref
    p = 3000
    batch = batch_from_reads(["clean"], [seq[p : p + READ_LEN]])
    aligner = Aligner.create(index, read_len=READ_LEN)
    recs = aligner.align_to_sam(batch)
    assert recs[0].cigar == f"{READ_LEN}M"
    assert recs[0].tags["NM"] == ("i", 0)


def test_mismatchy_but_gapless_read_kept_ungapped(ref):
    genome, seq, index = ref
    p = 4000
    read = list(seq[p : p + READ_LEN])
    # 7 mismatches in the second half (first seed clean) -> triggers SW,
    # but no gap wins -> full-M cigar kept
    for j in range(40, 68, 4):
        read[j] = "A" if read[j] != "A" else "C"
    batch = batch_from_reads(["mm7"], ["".join(read)])
    aligner = Aligner.create(index, read_len=READ_LEN)
    recs = aligner.align_to_sam(batch)
    assert recs[0].is_mapped
    assert recs[0].pos == p + 1
    assert recs[0].cigar == f"{READ_LEN}M"


def test_long_deletion_via_simple_indel(ref):
    """30-base deletion exceeds the SW band; the anchor-pair long-indel
    polish (SimpleIndelAligner analog) must recover it."""
    genome, seq, index = ref
    p = 9500
    read = seq[p : p + 40] + seq[p + 70 : p + 70 + 40]   # 30D after 40
    batch = batch_from_reads(["del30"], [read])
    aligner = Aligner.create(index, read_len=READ_LEN)
    rec = aligner.align_to_sam(batch)[0]
    assert rec.is_mapped
    assert rec.pos == p + 1
    assert rec.cigar == "40M30D40M", rec.cigar
    assert rec.tags["NM"] == ("i", 30)
    assert rec.mapq >= 40


def test_long_insertion_via_simple_indel(ref):
    genome, seq, index = ref
    p = 1000
    rng = np.random.default_rng(123)
    ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 25))
    # 100bp read: both flanks must fit a full 32-mer seed for anchoring
    read = seq[p : p + 40] + ins + seq[p + 40 : p + 75]  # 40M25I35M
    batch = batch_from_reads(["ins25"], [read])
    aligner = Aligner.create(index, read_len=100)
    rec = aligner.align_to_sam(batch)[0]
    assert rec.is_mapped
    assert rec.pos == p + 1
    assert rec.cigar in ("40M25I35M", "39M25I36M", "41M25I34M"), rec.cigar
    assert rec.tags["NM"][1] >= 25
