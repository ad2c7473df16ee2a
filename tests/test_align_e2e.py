"""End-to-end single-end alignment on a synthetic genome (config 1 of the
BASELINE ladder: SE exact-seed + ungapped scoring -> SAM)."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.aligner import Aligner
from isaac_aligner_tpu.align.pipeline import AlignConfig
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io import sam
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import batch_from_reads


def _random_genome(n, seed=7, name="chrT"):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    return genome_from_sequences([(name, seq)]), seq


@pytest.fixture(scope="module")
def small_ref():
    genome, seq = _random_genome(5000)
    index = build_index(genome, seed_len=32)
    return genome, seq, index


def _reads_from(seq, positions, read_len=64, reverse=None, mutate=None):
    reads = []
    for i, p in enumerate(positions):
        r = seq[p : p + read_len]
        if mutate:
            for mp, mb in mutate.get(i, []):
                r = r[:mp] + mb + r[mp + 1 :]
        if reverse and reverse[i]:
            r = dna.decode(dna.revcomp(dna.encode(r)))
        reads.append(r)
    return reads


def test_forward_exact_alignment(small_ref):
    genome, seq, index = small_ref
    positions = [10, 100, 1000, 2000, 4000, 4936]
    reads = _reads_from(seq, positions)
    batch = batch_from_reads([f"r{i}" for i in range(len(reads))], reads)
    aligner = Aligner.create(index, read_len=64)
    recs = aligner.align_to_sam(batch)
    assert len(recs) == len(positions)
    for rec, p in zip(recs, positions):
        assert rec.is_mapped, rec.qname
        assert rec.rname == "chrT"
        assert rec.pos == p + 1
        assert not (rec.flag & sam.FLAG_REVERSE)
        assert rec.cigar == "64M"
        assert rec.tags["NM"] == ("i", 0)
        assert rec.mapq > 0


def test_reverse_strand_alignment(small_ref):
    genome, seq, index = small_ref
    positions = [50, 500, 3000]
    reads = _reads_from(seq, positions, reverse=[True] * 3)
    batch = batch_from_reads([f"rev{i}" for i in range(3)], reads)
    aligner = Aligner.create(index, read_len=64)
    recs = aligner.align_to_sam(batch)
    for rec, p in zip(recs, positions):
        assert rec.is_mapped
        assert rec.pos == p + 1
        assert rec.flag & sam.FLAG_REVERSE
        # SAM stores the forward-genome-strand sequence
        assert rec.seq == seq[p : p + 64]


def test_mismatched_read_aligns_with_nm(small_ref):
    genome, seq, index = small_ref
    p = 700
    # both mutations inside seed 0's span so seed 1 (offset 32) still
    # matches exactly — exact-seed matching needs one clean seed
    reads = _reads_from(seq, [p], mutate={0: [(5, "A" if seq[p + 5] != "A" else "C"),
                                             (20, "G" if seq[p + 20] != "G" else "T")]})
    batch = batch_from_reads(["mm0"], reads)
    aligner = Aligner.create(index, read_len=64)
    recs = aligner.align_to_sam(batch)
    assert recs[0].is_mapped
    assert recs[0].pos == p + 1
    assert recs[0].tags["NM"] == ("i", 2)


def test_unalignable_read_unmapped(small_ref):
    genome, seq, index = small_ref
    batch = batch_from_reads(["junk"], ["GC" * 32])
    aligner = Aligner.create(index, read_len=64)
    recs = aligner.align_to_sam(batch)
    # GCGC... repeat may accidentally match; just check flags are coherent
    rec = recs[0]
    if not rec.is_mapped:
        assert rec.rname == "*"
        assert rec.pos == 0


def test_n_read_unmapped(small_ref):
    genome, seq, index = small_ref
    batch = batch_from_reads(["nn"], ["N" * 64])
    aligner = Aligner.create(index, read_len=64)
    recs = aligner.align_to_sam(batch)
    assert not recs[0].is_mapped


def test_repeat_read_low_mapq(small_ref):
    genome, seq, index = small_ref
    # a read from a duplicated region should get mapq 0-ish
    dup = seq[:2500] + seq[1000:1200] + seq[2700:]  # duplicate 1000:1200 at 2500
    genome2 = genome_from_sequences([("chrD", dup)])
    index2 = build_index(genome2, seed_len=32)
    reads = [dup[1020 : 1020 + 64]]
    batch = batch_from_reads(["rep"], reads)
    aligner = Aligner.create(index2, read_len=64)
    recs = aligner.align_to_sam(batch)
    assert recs[0].is_mapped
    # a perfect two-way tie gives floor(-10*log10(0.5)) == 3 under the
    # reference MAPQ formula (TemplateBuilder::updateMappingScore)
    assert recs[0].mapq <= 3


def test_mapq_unique_alignment_is_high(small_ref):
    genome, seq, index = small_ref
    reads = _reads_from(seq, [1234])
    batch = batch_from_reads(["u0"], reads)
    aligner = Aligner.create(index, read_len=64)
    recs = aligner.align_to_sam(batch)
    assert recs[0].mapq >= 40


def test_sam_parity_harness_catches_diffs(small_ref):
    genome, seq, index = small_ref
    reads = _reads_from(seq, [10, 100])
    batch = batch_from_reads(["a", "b"], reads)
    aligner = Aligner.create(index, read_len=64)
    recs = aligner.align_to_sam(batch)
    golden = [sam.SamRecord.from_line(r.to_line()) for r in recs]
    assert sam.diff_records(recs, golden) == []
    golden[0].pos += 1
    diffs = sam.diff_records(recs, golden)
    assert len(diffs) == 1 and "pos" in diffs[0]
