"""Multi-device SPMD path: 8 virtual CPU devices, index sharded over the
mesh `shard` axis, reads over `data`.  Results must match the
single-device pipeline exactly."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.align.pipeline import AlignConfig, align_batch_jit, prepare_index
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import batch_from_reads
from isaac_aligner_tpu.parallel import make_mesh, shard_index, sharded_align
from isaac_aligner_tpu.parallel.sharded import place_sharded


@pytest.fixture(scope="module")
def ref():
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    genome = genome_from_sequences([("chrS", seq)])
    index = build_index(genome, seed_len=16)
    return genome, seq, index


def test_shard_index_boundaries(ref):
    genome, seq, index = ref
    sh = shard_index(index, 4)
    # every real record accounted for
    assert int(sh.n_real.sum()) == index.num_records
    # shards sorted and k-mer-disjoint: last key of shard s < first key of s+1
    k_hi, k_lo, n_real = np.asarray(sh.key_hi), np.asarray(sh.key_lo), np.asarray(sh.n_real)
    for s in range(3):
        n_s, n_t = int(n_real[s, 0]), int(n_real[s + 1, 0])
        if n_s == 0 or n_t == 0:
            continue
        last = (int(k_hi[s, n_s - 1]), int(k_lo[s, n_s - 1]))
        first = (int(k_hi[s + 1, 0]), int(k_lo[s + 1, 0]))
        assert last < first  # strict: kmer runs never straddle


def test_sharded_matches_single_device(ref):
    genome, seq, index = ref
    rng = np.random.default_rng(11)
    read_len = 48
    positions = rng.integers(0, 3000 - read_len, 16)
    reads = []
    for i, p in enumerate(positions):
        r = seq[p : p + read_len]
        if i % 2:
            r = dna.decode(dna.revcomp(dna.encode(r)))
        reads.append(r)
    batch = batch_from_reads([f"r{i}" for i in range(len(reads))], reads)

    cfg = AlignConfig(seed_len=16, seed_offsets=(0, 16, 32))
    single = align_batch_jit(prepare_index(index), batch.bases, batch.quals, cfg)

    mesh = make_mesh(8, data=2, shard=4)
    sharded = place_sharded(mesh, shard_index(index, 4))
    multi = sharded_align(mesh, sharded, batch.bases, batch.quals, cfg)

    for k in ("aligned", "start", "reverse", "mapq", "mismatches", "edit_distance"):
        np.testing.assert_array_equal(np.asarray(single[k]), np.asarray(multi[k]),
                                      err_msg=f"field {k}")
    # spot-check correctness against ground truth
    starts = np.asarray(multi["start"])
    assert np.all(np.asarray(multi["aligned"]))
    np.testing.assert_array_equal(starts, positions)
