"""Robustness probes: malformed inputs, boundary reads, degenerate
batches (the verify checklist's 'should be unmapped or clipped, never
crash' class)."""

import gzip

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.aligner import Aligner
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences, read_fasta
from isaac_aligner_tpu.io.fastq import ReadBatch, pad_batch, read_fastq


def _fixture(glen=8000, seed=3):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, glen))
    genome = genome_from_sequences([("cA", seq[:4000]), ("cB", seq[4000:])])
    return genome, build_index(genome, seed_len=32)


def _batch(rows, lengths=None):
    ml = max(len(r) for r in rows)
    bases = np.full((len(rows), ml), 4, np.uint8)
    quals = np.zeros((len(rows), ml), np.uint8)
    for i, r in enumerate(rows):
        bases[i, : len(r)] = r
        quals[i, : len(r)] = 30
    if lengths is None:
        lengths = [len(r) for r in rows]
    return ReadBatch(names=[f"r{i}" for i in range(len(rows))], bases=bases,
                     quals=quals, lengths=np.array(lengths, np.int32))


def test_contig_boundary_read_unmapped_or_elsewhere():
    """A read spanning the cA/cB junction must not crash and must not be
    placed across the boundary."""
    genome, index = _fixture()
    row = genome.codes[4000 - 32 : 4000 + 32]  # straddles the junction
    al = Aligner.create(index, read_len=64, base_quality_cutoff=0)
    recs = al.align_to_sam(_batch([row]))
    r = recs[0]
    if r.is_mapped:
        # any placement must sit fully inside one contig
        assert r.rname in ("cA", "cB")
        contig = next(c for c in genome.contigs if c.name == r.rname)
        assert r.pos >= 1 and r.pos - 1 + 64 <= contig.length


def test_all_n_read_unmapped():
    genome, index = _fixture()
    al = Aligner.create(index, read_len=64, base_quality_cutoff=0)
    recs = al.align_to_sam(_batch([np.full(64, 4, np.uint8)]))
    assert recs[0].flag & 4


def test_read_shorter_than_seed_is_unmapped_not_crash():
    genome, index = _fixture()
    short = genome.codes[100:120]  # 20bp < seed 32
    al = Aligner.create(index, read_len=64, base_quality_cutoff=0)
    recs = al.align_to_sam(_batch([short], lengths=[20]))
    # padded tail is N, seeds contain N -> unmapped; must not crash
    assert recs[0].flag & 4


def test_mixed_length_batch():
    genome, index = _fixture()
    rows = [genome.codes[100:164], genome.codes[900:950]]  # 64bp + 50bp
    al = Aligner.create(index, read_len=64, base_quality_cutoff=0)
    recs = al.align_to_sam(_batch(rows, lengths=[64, 50]))
    assert recs[0].pos == 101 and recs[0].is_mapped
    # 50bp read: one 32-mer seed fits at offset 0
    assert recs[1].is_mapped and recs[1].pos == 901


def test_malformed_fastq(tmp_path):
    f = tmp_path / "bad.fq"
    f.write_text("@r1\nACGT\nNOTPLUS\nIIII\n")
    with pytest.raises(ValueError):
        read_fastq(f)
    f.write_text("@r1\nACGT\n+\nIII\n")   # qual length mismatch
    with pytest.raises(ValueError):
        read_fastq(f)


def test_gzipped_fastq(tmp_path):
    f = tmp_path / "r.fq.gz"
    with gzip.open(f, "wt") as fh:
        fh.write("@a\nACGTACGT\n+\nIIIIIIII\n")
    b = read_fastq(f)
    assert b.count == 1 and b.read_len == 8


def test_empty_fasta(tmp_path):
    f = tmp_path / "e.fa"
    f.write_text("")
    with pytest.raises(ValueError):
        read_fasta(f)


def test_pad_batch_roundtrip():
    genome, index = _fixture()
    rows = [genome.codes[100:164]]
    b = pad_batch(_batch(rows), 8)
    assert b.count == 8
    al = Aligner.create(index, read_len=64, base_quality_cutoff=0)
    recs = al.align_to_sam(b)
    assert len(recs) == 1   # padding rows skipped
