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


def _np_dedup_oracle(a_self, a_mate, rank, tie, cls, lib):
    """Reference duplicate marking: group by (cls, lib, a_self, a_mate),
    keep the best (rank, tie), mark the rest."""
    n = len(a_self)
    dup = np.zeros(n, bool)
    groups = {}
    for i in range(n):
        if cls[i] < 0:
            continue
        groups.setdefault((cls[i], lib[i], a_self[i], a_mate[i]),
                          []).append(i)
    for rows in groups.values():
        rows.sort(key=lambda i: (-rank[i], -tie[i]))
        for i in rows[1:]:
            dup[i] = True
    return dup


def test_collective_dedup_matches_oracle():
    import jax
    from isaac_aligner_tpu.parallel.sharded import collective_dedup
    from jax.sharding import Mesh

    rng = np.random.default_rng(5)
    n = 256
    # clustered anchors so real duplicate groups exist
    a_self = rng.integers(0, 40, n).astype(np.int64) * 2 + rng.integers(0, 2, n)
    a_mate = rng.integers(0, 40, n).astype(np.int64) * 2
    rank = rng.integers(0, 1 << 40, n).astype(np.int64)
    tie = rng.integers(0, 1 << 40, n).astype(np.int64)
    cls = rng.integers(-1, 4, n).astype(np.int64)   # some skipped rows
    lib = rng.integers(0, 2, n).astype(np.int64)

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("dev",))
    flags, overflow = collective_dedup(mesh, "dev", a_self, a_mate,
                                       rank, tie, cls, lib)
    flags = np.asarray(flags)
    assert int(np.asarray(overflow).sum()) == 0
    want = _np_dedup_oracle(a_self, a_mate, rank, tie, cls, lib)
    np.testing.assert_array_equal(flags, want)


def test_sharded_paired_exact_across_mesh_sizes(ref):
    """8-device paired SPMD (incl. in-program rescue) must equal the
    1-device run of the same program exactly — the dryrun oracle."""
    import jax
    from isaac_aligner_tpu.align.pairs import TlsStatic
    from isaac_aligner_tpu.parallel.sharded import sharded_align_paired

    genome, seq, index = ref
    rng = np.random.default_rng(23)
    read_len = 48

    def rc(s):
        return dna.decode(dna.revcomp(dna.encode(s)))

    r1s, r2s = [], []
    for i in range(16):
        p = int(rng.integers(0, 3000 - 600))
        t = int(rng.integers(300, 500))
        r1 = seq[p : p + read_len]
        if i % 4 == 1:   # scramble read 1 -> rescue path
            r1 = "".join("A" if j % 7 == 3 and c != "A" else c
                         for j, c in enumerate(r1))
        r1s.append(r1)
        r2s.append(rc(seq[p + t - read_len : p + t]))
    b1 = batch_from_reads([f"p{i}" for i in range(16)], r1s)
    b2 = batch_from_reads([f"p{i}" for i in range(16)], r2s)

    cfg = AlignConfig(seed_len=16, seed_offsets=(0, 16, 32))
    tls = TlsStatic(min=250, max=550, mate_min=250, mate_max=550,
                    best0=1, best1=6)

    outs = {}
    for name, (data, shard) in (("one", (1, 1)), ("eight", (2, 4))):
        mesh = make_mesh(data * shard, data=data, shard=shard)
        sharded = place_sharded(mesh, shard_index(index, shard))
        step = jax.jit(lambda sh, a1, c1, a2, c2, m=mesh: sharded_align_paired(
            m, sh, a1, c1, a2, c2, cfg, tls))
        outs[name] = {k: np.asarray(v) for k, v in jax.device_get(step(
            sharded, b1.bases, b1.quals, b2.bases, b2.quals)).items()}

    assert bool(outs["eight"]["aligned_1"].all()), "rescue must recover r1"
    assert int(outs["eight"]["proper_pair"].sum()) >= 14
    for k in sorted(outs["one"]):
        a, b = outs["one"][k], outs["eight"][k]
        if k.startswith("cand_") and not k.startswith("cand_valid"):
            # candidate grids: only valid slots carry meaning (invalid
            # padding content depends on the concatenated hit-list layout)
            e = k[-2:]
            va = outs["one"]["cand_valid" + e]
            vb = outs["eight"]["cand_valid" + e]
            np.testing.assert_array_equal(va, vb, err_msg=f"field {k} mask")
            a = np.where(va, a, 0)
            b = np.where(vb, b, 0)
        np.testing.assert_array_equal(a, b, err_msg=f"field {k}")
