"""Neighbor second-chance seed matching (reference NeighborMaskMatcher,
lib/alignment/matchFinder/NeighborMaskMatcher.cpp:44-268): seeds with no
exact index hit scan their 16-base-prefix block for suffix-Hamming<=1
k-mers."""

import numpy as np

from isaac_aligner_tpu.align.pipeline import AlignConfig, default_seed_offsets
from isaac_aligner_tpu.aligner import Aligner
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import ReadBatch


def _fixture(read_len=64, genome_len=20_000, seed=3):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, genome_len))
    genome = genome_from_sequences([("chrN", seq)])
    index = build_index(genome, seed_len=32)
    return genome, index


def _mutate(codes, pos):
    out = codes.copy()
    out[pos] = (out[pos] + 1) % 4
    return out


def _batch(bases_rows):
    bases = np.stack(bases_rows).astype(np.uint8)
    quals = np.full(bases.shape, 35, np.uint8)
    return ReadBatch(names=[f"r{i}" for i in range(len(bases_rows))],
                     bases=bases, quals=quals,
                     lengths=np.full(len(bases_rows), bases.shape[1], np.int32))


def test_neighbor_matching_rescues_all_seeds_mutated():
    genome, index = _fixture()
    read_len = 64
    start = 5_000
    codes = genome.codes[start:start + read_len]
    # one SNP in the SUFFIX half of each 32-mer seed window: every exact
    # seed misses, but the 16-base prefixes stay intact
    codes = _mutate(_mutate(codes, 20), 52)
    batch = _batch([codes])

    def run(threshold):
        cfg = AlignConfig(seed_len=32,
                          seed_offsets=default_seed_offsets(read_len, 32),
                          neighborhood_size_threshold=threshold)
        al = Aligner.create(index, read_len=read_len, cfg=cfg,
                            base_quality_cutoff=0)
        return al.align_to_sam(batch)[0]

    off = run(0)
    assert off.flag & 4, "without neighbor matching the read must be unmapped"

    on = run(100)
    assert not (on.flag & 4)
    assert on.pos == start + 1
    assert on.tags["NM"][1] == 2


def test_neighbor_matching_leaves_exact_reads_alone():
    genome, index = _fixture(seed=4)
    read_len = 64
    starts = [1_000, 9_000]
    rows = [genome.codes[s:s + read_len] for s in starts]
    batch = _batch(rows)
    cfg = AlignConfig(seed_len=32,
                      seed_offsets=default_seed_offsets(read_len, 32),
                      neighborhood_size_threshold=100)
    al = Aligner.create(index, read_len=read_len, cfg=cfg,
                        base_quality_cutoff=0)
    recs = al.align_to_sam(batch)
    assert [r.pos for r in recs] == [s + 1 for s in starts]
    assert all(r.tags["NM"][1] == 0 for r in recs)
    assert all(r.mapq >= 50 for r in recs)
