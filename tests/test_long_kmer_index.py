"""True 64-mer LongKmerType index (reference include/oligo/Kmer.hh:32-38,
ReferenceSorter.cpp:104-176): four int32 key planes, 4-word binary
search, repeat suppression at 64-MER granularity.

The decisive semantic difference from the round-1..3 fallback (32-mer
search + extension verify): a 32-mer repeated past the repeat threshold
is collapsed to TOO_MANY in a 32-mer index, killing every seed over it —
even when the full 64-mer is unique.  The true 64-mer index keys on all
64 bases, so those seeds stay searchable.
"""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.align.pipeline import AlignConfig, default_seed_offsets
from isaac_aligner_tpu.aligner import Aligner
from isaac_aligner_tpu.index.build import (build_index, build_index_streaming,
                                           SeedIndex)
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


@pytest.fixture(scope="module")
def repeat_genome():
    """Genome where every 32-mer of the probe loci is a >threshold repeat
    but each 64-mer is unique: units U0..U5 (32bp each), 24 distinct unit
    PAIRS laid head-to-tail with random spacers.  Each unit appears 8
    times (> threshold 4); each pair once."""
    rng = np.random.default_rng(91)
    units = [rng.integers(0, 4, 32).astype(np.uint8) for _ in range(6)]
    # all 30 ordered pairs: every unit occurs 10 times (5 as head + 5 as
    # tail), comfortably past the repeat threshold of 4.  Note the seed at
    # a read's offset 32 is the TAIL unit alone (not a pair), so both
    # seeds of a 64bp probe read are over-threshold repeats in 32-mer mode.
    pair_ids = [(i, j) for i in range(6) for j in range(6) if i != j]
    parts = [rng.integers(0, 4, 600).astype(np.uint8)]
    pair_starts = {}
    pos = 600
    for (i, j) in pair_ids:
        pair_starts[(i, j)] = pos
        parts.append(units[i])
        parts.append(units[j])
        pos += 64
        spacer = rng.integers(0, 4, 20).astype(np.uint8)
        parts.append(spacer)
        pos += 20
    parts.append(rng.integers(0, 4, 600).astype(np.uint8))
    codes = np.concatenate(parts)
    genome = genome_from_sequences([("cR", dna.decode(codes))])
    return genome, pair_starts


def test_64mer_unique_locus_aligns_where_32mer_mode_dies(repeat_genome):
    """VERDICT r4 criterion: a 32-mer-repeat/64-mer-unique locus aligns
    with MAPQ>0 in 64-mer mode and dies in 32-mer mode."""
    genome, pair_starts = repeat_genome
    idx32 = build_index(genome, seed_len=32, repeat_threshold=4)
    idx64 = build_index(genome, seed_len=64, repeat_threshold=4)
    assert len(idx64.key_mids) == 2
    assert idx64.seed_len == 64

    probes = list(pair_starts.values())[:6]
    rows = [genome.codes[p : p + 64] for p in probes]

    recs32 = _aligner(idx32, 64, 32).align_to_sam(_batch(rows))
    # every 32-mer seed of the read is a collapsed repeat -> unaligned
    assert all(r.flag & 4 for r in recs32), \
        [(r.pos, r.mapq, r.flag) for r in recs32]

    recs64 = _aligner(idx64, 64, 64).align_to_sam(_batch(rows))
    for r, p in zip(recs64, probes):
        assert not (r.flag & 4), (r.qname, p)
        assert r.pos == p + 1
        assert r.mapq > 0


def test_64mer_index_save_load_roundtrip(tmp_path, repeat_genome):
    genome, _ = repeat_genome
    idx = build_index(genome, seed_len=64, repeat_threshold=4)
    idx.save(tmp_path / "idx64")
    loaded = SeedIndex.load(tmp_path / "idx64")
    assert loaded.seed_len == 64
    np.testing.assert_array_equal(loaded.key_hi, idx.key_hi)
    np.testing.assert_array_equal(loaded.key_lo, idx.key_lo)
    assert len(loaded.key_mids) == 2
    for a, b in zip(loaded.key_mids, idx.key_mids):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(loaded.pos, idx.pos)

    rows = [genome.codes[700 : 700 + 80]]
    r1 = _aligner(idx, 80, 64).align_to_sam(_batch(rows))
    r2 = _aligner(loaded, 80, 64).align_to_sam(_batch(rows))
    assert r1[0].pos == r2[0].pos == 701


def test_64mer_streaming_build_byte_identical(tmp_path, repeat_genome):
    genome, _ = repeat_genome
    ram = build_index(genome, seed_len=64, repeat_threshold=4)
    st = build_index_streaming(genome, tmp_path / "st64", seed_len=64,
                               repeat_threshold=4, annotate_neighbors=False,
                               mask_width=4)
    np.testing.assert_array_equal(np.asarray(st.key_hi), ram.key_hi)
    for a, b in zip(st.key_mids, ram.key_mids):
        np.testing.assert_array_equal(np.asarray(a), b)
    np.testing.assert_array_equal(np.asarray(st.key_lo), ram.key_lo)
    np.testing.assert_array_equal(np.asarray(st.pos), ram.pos)
    assert st.total_kmers == ram.total_kmers
    assert st.collapsed_kmers == ram.collapsed_kmers


def test_64mer_repeat_semantics(repeat_genome):
    """Repeat collapse happens at 64-mer granularity: the index keeps
    every unique pair 64-mer even though each unit 32-mer repeats."""
    genome, pair_starts = repeat_genome
    idx = build_index(genome, seed_len=64, repeat_threshold=4)
    # every probe position must be present as a real record
    present = set(int(p) for p in idx.pos if p >= 0)
    for p in pair_starts.values():
        assert p in present


def test_64mer_index_through_workflow(tmp_path, repeat_genome):
    """The CLI/workflow surface consumes a saved true 64-mer index:
    sort-reference -s 64 then align end to end."""
    from isaac_aligner_tpu.io.bam import read_bam
    from isaac_aligner_tpu.workflow.align import (AlignWorkflow,
                                                  WorkflowOptions)

    genome, pair_starts = repeat_genome
    idx = build_index(genome, seed_len=64, repeat_threshold=4)
    idx.save(tmp_path / "idx64w")
    probes = list(pair_starts.values())[:8]
    with open(tmp_path / "r.fq", "w") as f:
        for i, p in enumerate(probes):
            s = dna.decode(genome.codes[p : p + 64])
            f.write(f"@w{i}\n{s}\n+\n{'I' * 64}\n")
    out = tmp_path / "w64out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "idx64w"), output_dir=str(out),
        fastq1=str(tmp_path / "r.fq"), batch_size=8, seed_len=64,
        realign_gaps="no", base_quality_cutoff=0)).run()
    _, _, recs = read_bam(out / "sorted.bam")
    by = {r.qname: r for r in recs}
    for i, p in enumerate(probes):
        assert by[f"w{i}"].pos == p + 1
        assert by[f"w{i}"].mapq > 0


def test_64mer_sharded_matches_single_device(repeat_genome):
    """Index-sharded SPMD over the true 64-mer index (4-plane search per
    shard + all-gather) matches the single-device result, and the
    genome-sharded mode is no longer excluded for 64-mer seeds."""
    from isaac_aligner_tpu.parallel.sharded_aligner import ShardedAligner

    genome, pair_starts = repeat_genome
    idx = build_index(genome, seed_len=64, repeat_threshold=4)
    probes = list(pair_starts.values())[:8]
    rows = [genome.codes[p : p + 64] for p in probes]
    batch = _batch(rows)

    single = _aligner(idx, 64, 64)
    want = single.align_batch_arrays(batch, gapped=False)

    cfg = AlignConfig(seed_len=64, seed_offsets=default_seed_offsets(64, 64))
    for genome_sharded in (False, True):
        al = ShardedAligner.create_sharded(
            idx, n_devices=4, read_len=64, cfg=cfg, base_quality_cutoff=0,
            genome_sharded=genome_sharded)
        got = al.align_batch_arrays(batch, gapped=False)
        for k in ("aligned", "start", "reverse", "mapq", "mismatches",
                  "edit_distance"):
            np.testing.assert_array_equal(
                got[k], want[k],
                err_msg=f"field {k} (genome_sharded={genome_sharded})")
    assert want["aligned"].all()
