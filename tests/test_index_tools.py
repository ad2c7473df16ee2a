"""Auxiliary index tools: neighbor bitmap/wig, merge, reorder, pack/unpack."""

import numpy as np
import pytest

from isaac_aligner_tpu.cli import main as cli_main
from isaac_aligner_tpu.index.build import SeedIndex, build_index
from isaac_aligner_tpu.index.tools import (bitmap_to_wig, extract_neighbor_bitmap,
                                           merge_indexes, reorder_reference)
from isaac_aligner_tpu.io.fasta import genome_from_sequences


def _genome(seed, n, name):
    rng = np.random.default_rng(seed)
    return genome_from_sequences(
        [(name, "".join("ACGT"[i] for i in rng.integers(0, 4, n)))])


def test_merge_indexes_equals_joint_build():
    gA = _genome(1, 700, "cA")
    gB = _genome(2, 900, "cB")
    joint = genome_from_sequences([
        ("cA", "".join("ACGTN"[c] for c in gA.codes)),
        ("cB", "".join("ACGTN"[c] for c in gB.codes)),
    ])
    merged = merge_indexes([build_index(gA, seed_len=32),
                            build_index(gB, seed_len=32)])
    ref = build_index(joint, seed_len=32)
    np.testing.assert_array_equal(merged.key_hi, ref.key_hi)
    np.testing.assert_array_equal(merged.key_lo, ref.key_lo)
    np.testing.assert_array_equal(merged.pos, ref.pos)
    assert [c.name for c in merged.genome.contigs] == ["cA", "cB"]


def test_reorder_reference_preserves_alignment():
    from isaac_aligner_tpu.aligner import Aligner
    from isaac_aligner_tpu.io.fastq import batch_from_reads

    rng = np.random.default_rng(3)
    sA = "".join("ACGT"[i] for i in rng.integers(0, 4, 800))
    sB = "".join("ACGT"[i] for i in rng.integers(0, 4, 600))
    genome = genome_from_sequences([("cA", sA), ("cB", sB)])
    idx = build_index(genome, seed_len=32)
    re_idx = reorder_reference(idx, ["cB", "cA"])
    assert [c.name for c in re_idx.genome.contigs] == ["cB", "cA"]
    # a read from cA must still align to cA at the same local position
    batch = batch_from_reads(["r"], [sA[100:164]])
    rec = Aligner.create(re_idx, read_len=64).align_to_sam(batch)[0]
    assert rec.rname == "cA"
    assert rec.pos == 101


def test_neighbor_bitmap_and_wig(tmp_path):
    rng = np.random.default_rng(4)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 1200))
    dup = seq[:600] + seq[100:160] + seq[600:]
    genome = genome_from_sequences([("cN", dup)])
    idx = build_index(genome, seed_len=32, annotate_neighbors=True)
    bitmap = extract_neighbor_bitmap(idx)
    bits = np.unpackbits(bitmap)
    assert bits.sum() > 0
    bitmap_to_wig(bitmap, genome, tmp_path / "n.wig")
    text = (tmp_path / "n.wig").read_text()
    assert "fixedStep chrom=cN" in text
    assert "1" in text


def test_pack_unpack_cli_roundtrip(tmp_path):
    genome = _genome(5, 1000, "cP")
    idx = build_index(genome, seed_len=32)
    idx.save(tmp_path / "idx")
    assert cli_main(["pack-reference", "-i", str(tmp_path / "idx"),
                     "-o", str(tmp_path / "idx.tgz")]) == 0
    assert cli_main(["unpack-reference", "-i", str(tmp_path / "idx.tgz"),
                     "-o", str(tmp_path / "idx2")]) == 0
    idx2 = SeedIndex.load(tmp_path / "idx2")
    np.testing.assert_array_equal(idx2.key_hi, idx.key_hi)
    np.testing.assert_array_equal(idx2.pos, idx.pos)


def test_merge_cli(tmp_path):
    gA = _genome(6, 500, "m1")
    gB = _genome(7, 500, "m2")
    build_index(gA, seed_len=32).save(tmp_path / "a")
    build_index(gB, seed_len=32).save(tmp_path / "b")
    rc = cli_main(["merge-references", "-i", str(tmp_path / "a"),
                   "-i", str(tmp_path / "b"),
                   "-o", str(tmp_path / "m")])
    assert rc == 0
    merged = SeedIndex.load(tmp_path / "m")
    assert [c.name for c in merged.genome.contigs] == ["m1", "m2"]
