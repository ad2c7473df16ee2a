"""64-mer seed mode (reference LongKmerType, include/oligo/Kmer.hh:32-38):
32-mer index search + packed-genome extension verification."""

import numpy as np

from isaac_aligner_tpu.align.pipeline import AlignConfig, default_seed_offsets
from isaac_aligner_tpu.aligner import Aligner
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import ReadBatch


def _batch(rows):
    bases = np.stack(rows).astype(np.uint8)
    return ReadBatch(names=[f"r{i}" for i in range(len(rows))], bases=bases,
                     quals=np.full(bases.shape, 35, np.uint8),
                     lengths=np.full(len(rows), bases.shape[1], np.int32))


def _aligner(index, read_len, seed_len):
    cfg = AlignConfig(seed_len=seed_len,
                      seed_offsets=default_seed_offsets(read_len, seed_len))
    return Aligner.create(index, read_len=read_len, cfg=cfg,
                          base_quality_cutoff=0)


def test_long_seed_uniqueness():
    """A 40-base repeat unit is ambiguous to 32-mers but a 64-mer seed's
    extension disambiguates nothing-matches vs unique placements."""
    rng = np.random.default_rng(31)
    read_len = 100
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 20_000))
    genome = genome_from_sequences([("c", seq)])
    index = build_index(genome, seed_len=32)

    starts = [4_000, 9_000, 15_000]
    rows = [genome.codes[s:s + read_len] for s in starts]
    recs = _aligner(index, read_len, 64).align_to_sam(_batch(rows))
    assert [r.pos for r in recs] == [s + 1 for s in starts]
    assert all(r.tags["NM"][1] == 0 for r in recs)
    assert all(r.mapq >= 50 for r in recs)


def test_long_seed_extension_mismatch_rejected():
    """A read matching a 32-mer prefix at a decoy locus but differing in
    the extension must not anchor at the decoy."""
    rng = np.random.default_rng(33)
    read_len = 80
    # construct: locus A (true) and a decoy that copies only the first
    # 32 bases of A's window
    bg = "".join("ACGT"[i] for i in rng.integers(0, 4, 12_000))
    true_window = "".join("ACGT"[i] for i in rng.integers(0, 4, read_len))
    decoy = true_window[:32] + "".join(
        "ACGT"[i] for i in rng.integers(0, 4, read_len - 32))
    seq = bg[:4000] + true_window + bg[4000:8000] + decoy + bg[8000:]
    genome = genome_from_sequences([("c", seq)])
    index = build_index(genome, seed_len=32)

    rows = [np.frombuffer(true_window.encode(), np.uint8)]
    from isaac_aligner_tpu import dna
    rows = [dna.encode(true_window)]
    recs = _aligner(index, read_len, 64).align_to_sam(_batch(rows))
    assert recs[0].pos == 4001
    # with 64-mer seeds the decoy contributes no candidate at all:
    # mapq stays high (no probability mass at the decoy)
    assert recs[0].mapq >= 50


def test_long_seed_rc_reads():
    rng = np.random.default_rng(35)
    read_len = 100
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 15_000))
    genome = genome_from_sequences([("c", seq)])
    index = build_index(genome, seed_len=32)
    start = 6_000
    from isaac_aligner_tpu import dna
    fwd = genome.codes[start:start + read_len]
    rc = dna.revcomp(fwd)
    recs = _aligner(index, read_len, 64).align_to_sam(_batch([rc]))
    assert recs[0].pos == start + 1
    assert recs[0].flag & 16
