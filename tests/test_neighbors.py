"""Neighbor annotation: block permutations, neighbor finding, MAPQ gating."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.index import neighbors as nb
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences


def test_block_permutations_count():
    perms = nb.block_permutations(4)
    assert len(perms) == 70  # C(8,4)
    for p in perms:
        assert sorted(p) == list(range(8))


def test_permute_blocks_roundtrip():
    rng = np.random.default_rng(0)
    kmers = rng.integers(0, 2**63, 100, dtype=np.uint64)
    order = (3, 1, 7, 5, 0, 2, 4, 6)
    permuted = nb.permute_blocks(kmers, order, 32)
    # applying the inverse permutation restores the original
    inverse = tuple(np.argsort(order))
    restored = nb.permute_blocks(permuted, inverse, 32)
    assert np.array_equal(restored, kmers)


def test_base_mismatch_count():
    a = dna.pack_kmer(dna.encode("ACGTACGTACGTACGTACGTACGTACGTACGT"))
    b_s = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    for n_mut in (0, 1, 3, 5):
        s = list(b_s)
        for j in range(n_mut):
            pos = 3 + j * 6
            s[pos] = "A" if s[pos] != "A" else "G"
        b = dna.pack_kmer(dna.encode("".join(s)))
        x = np.array([np.uint64(a) ^ np.uint64(b)])
        assert nb._base_mismatches_u64(x)[0] == n_mut


def _mutate(s, positions):
    out = list(s)
    for p in positions:
        out[p] = "A" if out[p] != "A" else "G"
    return "".join(out)


def test_find_neighbors_within_4():
    rng = np.random.default_rng(1)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 32))
    others = ["".join("ACGT"[i] for i in rng.integers(0, 4, 32))
              for _ in range(50)]
    near1 = _mutate(base, [5])
    near4 = _mutate(base, [1, 9, 17, 30])   # spread across 4 blocks
    far5 = _mutate(base, [1, 9, 17, 25, 30])
    kmers = np.array([dna.pack_kmer(dna.encode(s))
                      for s in [base, near1, near4, far5] + others],
                     dtype=np.uint64)
    kmers = np.unique(kmers)
    bits = nb.find_neighbors(kmers, k=32)
    val = {int(k): bool(v) for k, v in zip(kmers, bits)}
    assert val[dna.pack_kmer(dna.encode(base))]
    assert val[dna.pack_kmer(dna.encode(near1))]
    assert val[dna.pack_kmer(dna.encode(near4))]
    # far5 is within 1 of near4 (positions 25) -> may legitimately be a
    # neighbor of near4; just check the random background is clean
    clean = [k for k in others
             if all(sum(a != b for a, b in zip(k, o)) > 4
                    for o in [base, near1, near4, far5] + others if o != k)]
    for s in clean:
        assert not val[dna.pack_kmer(dna.encode(s))], s


def test_repeat_region_mapq_zero_via_neighbors():
    """Two near-identical genome regions (1 mismatch apart): exact seeds
    find only one placement, but the neighbor bit must demote MAPQ."""
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    region = seq[1000:1100]
    # copy with a single mismatch in every 32-mer window (mutate ~ every 16bp)
    copy = _mutate(region, list(range(7, 100, 16)))
    genome_seq = seq[:2000] + copy + seq[2000:]
    genome = genome_from_sequences([("chrN", genome_seq)])

    from isaac_aligner_tpu.aligner import Aligner
    from isaac_aligner_tpu.io.fastq import batch_from_reads

    idx_nb = build_index(genome, seed_len=32, annotate_neighbors=True)
    assert idx_nb.has_neighbors is not None
    assert idx_nb.has_neighbors.any()

    # mutate the read inside seed 1's span so only seed 0 anchors it; that
    # lone anchor has neighbors -> not well anchored (two agreeing seeds
    # would rescue it, matching the reference's isWellAnchored comment)
    read = _mutate(region[:64], [40, 52])
    batch = batch_from_reads(["amb"], [read])
    rec_nb = Aligner.create(idx_nb, read_len=64).align_to_sam(batch)[0]
    idx_plain = build_index(genome, seed_len=32, annotate_neighbors=False)
    rec_plain = Aligner.create(idx_plain, read_len=64).align_to_sam(batch)[0]

    assert rec_plain.is_mapped and rec_nb.is_mapped
    assert rec_plain.mapq > 0          # without annotation: looks unique
    assert rec_nb.mapq == 0            # with annotation: anchoring demoted


def test_unique_read_unaffected_by_annotation():
    rng = np.random.default_rng(4)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    genome = genome_from_sequences([("chrU", seq)])
    idx = build_index(genome, seed_len=32, annotate_neighbors=True)

    from isaac_aligner_tpu.aligner import Aligner
    from isaac_aligner_tpu.io.fastq import batch_from_reads

    batch = batch_from_reads(["u"], [seq[500:564]])
    rec = Aligner.create(idx, read_len=64).align_to_sam(batch)[0]
    assert rec.is_mapped and rec.mapq >= 40


def test_annotate_index_chunked_matches_in_ram(tmp_path):
    """Chunked (bounded-RAM) annotation == plain annotate_index, both for
    the in-RAM small path and the disk-partitioned big path."""
    import numpy as np
    from isaac_aligner_tpu.index import neighbors as nb
    from isaac_aligner_tpu.index.build import build_index
    from isaac_aligner_tpu.io.fasta import genome_from_sequences

    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    # inject a near-duplicate segment (2 mismatches) so neighbor bits fire
    seg = list(seq[100:164])
    seg[10] = "T" if seg[10] != "T" else "A"
    seg[40] = "C" if seg[40] != "C" else "G"
    seq = seq + "".join(seg)
    genome = genome_from_sequences([("chrN", seq)])
    idx = build_index(genome, seed_len=32)

    ref_bits = nb.annotate_index(idx.key_hi, idx.key_lo, k=32).astype(np.uint8)
    assert ref_bits.any(), "fixture must produce some neighbor bits"

    small = nb.annotate_index_chunked(idx.key_hi, idx.key_lo, k=32,
                                      chunk=257, work_dir=tmp_path)
    np.testing.assert_array_equal(np.asarray(small), ref_bits)

    big = nb.annotate_index_chunked(idx.key_hi, idx.key_lo, k=32,
                                    chunk=257, mem_records=64, part_bits=3,
                                    out_path=tmp_path / "nb.npy",
                                    work_dir=tmp_path)
    np.testing.assert_array_equal(np.asarray(big), ref_bits)
