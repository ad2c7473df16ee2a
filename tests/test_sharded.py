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


def test_sharded_driver_matches_single_device(ref):
    """ShardedAligner (the `align --devices N` driver) must reproduce the
    single-device Aligner exactly through the whole host pipeline —
    device quality trim, semialigned clip, gapped polish, output
    orientation, cigars."""
    from isaac_aligner_tpu.aligner import Aligner
    from isaac_aligner_tpu.io.fastq import ReadBatch
    from isaac_aligner_tpu.parallel.sharded_aligner import ShardedAligner

    genome, seq, index = ref
    rng = np.random.default_rng(31)
    read_len = 48
    n = 16
    reads = []
    for i in range(n):
        p = int(rng.integers(0, 3000 - read_len))
        r = seq[p : p + read_len]
        if i % 2:
            r = dna.decode(dna.revcomp(dna.encode(r)))
        if i % 5 == 1:
            r = r[:20] + "T" + r[21:]
        reads.append(r)
    base = batch_from_reads([f"r{i}" for i in range(n)], reads)
    quals = np.asarray(base.quals).copy()
    quals[:, -6:] = 5                      # exercise device quality trim
    batch = ReadBatch(base.names, base.bases, quals, base.lengths)

    cfg = AlignConfig(seed_len=16, seed_offsets=(0, 16, 32))
    mesh = make_mesh(8, data=2, shard=4)
    one = Aligner.create(index, read_len=read_len, cfg=cfg,
                         base_quality_cutoff=20)
    many = ShardedAligner.create_sharded(index, mesh=mesh, read_len=read_len,
                                         cfg=cfg, base_quality_cutoff=20)
    r1 = one.align_batch_arrays(batch)
    r8 = many.align_batch_arrays(batch)
    for k in ("aligned", "start", "reverse", "mapq", "edit_distance",
              "mismatches"):
        np.testing.assert_array_equal(np.asarray(r1[k]), np.asarray(r8[k]),
                                      err_msg=f"field {k}")
    assert r1.get("cigar") == r8.get("cigar")


def test_sharded_paired_driver_matches_single_device(ref):
    """ShardedPairedAligner (in-program rescue) vs PairedAligner (host
    rescue): identical results including rescued rows."""
    from isaac_aligner_tpu.aligner import PairedAligner
    from isaac_aligner_tpu.align.pairs import TlsStatic
    from isaac_aligner_tpu.parallel.sharded_aligner import ShardedPairedAligner

    genome, seq, index = ref
    rng = np.random.default_rng(37)
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
    mesh = make_mesh(8, data=2, shard=4)
    one = PairedAligner.create(index, read_len=read_len, cfg=cfg)
    one.tls = tls
    many = ShardedPairedAligner.create_sharded(index, mesh=mesh,
                                               read_len=read_len, cfg=cfg)
    many.tls = tls
    r1 = one.align_batch_arrays(b1, b2)
    r8 = many.align_batch_arrays(b1, b2)
    assert bool(np.asarray(r8["aligned_1"]).all()), "rescue must recover r1"
    for k in ("aligned_1", "aligned_2", "start_1", "start_2", "reverse_1",
              "reverse_2", "proper_pair", "template_length", "template_score",
              "frag_score_1", "frag_score_2", "edit_distance_1",
              "edit_distance_2"):
        np.testing.assert_array_equal(np.asarray(r1[k]), np.asarray(r8[k]),
                                      err_msg=f"field {k}")
    assert r1.get("cigar_1") == r8.get("cigar_1")
    assert r1.get("cigar_2") == r8.get("cigar_2")


def test_workflow_devices_byte_identical(tmp_path):
    """`align --devices 8` (SPMD + collective Build-phase dedup) produces
    byte-identical sorted.bam to the single-device workflow."""
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(11)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 9000))
    (tmp_path / "ref.fa").write_text(
        ">c1\n" + g[:5000] + "\n>c2\n" + g[5000:] + "\n")

    def rc(s):
        return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]

    n = 32
    with open(tmp_path / "r1.fq", "w") as f1, \
            open(tmp_path / "r2.fq", "w") as f2:
        for i in range(n):
            p = int(rng.integers(0, 9000 - 500))
            t = int(rng.integers(300, 460))
            s1 = list(g[p:p + 80])
            if i % 5 == 1:   # mutations -> rescue path
                for j in range(0, 80, 9):
                    s1[j] = "ACGT"[("ACGT".index(s1[j]) + 1) % 4]
            if i % 7 == 2:   # duplicate pairs -> collective dedup path
                p, t = 800, 350
                s1 = list(g[p:p + 80])
            s2 = rc(g[p + t - 80:p + t])
            q = "".join(chr(33 + int(x)) for x in rng.integers(20, 40, 80))
            f1.write(f"@rd{i}\n{''.join(s1)}\n+\n{q}\n")
            f2.write(f"@rd{i}\n{s2}\n+\n{'I' * 80}\n")

    base = dict(reference=str(tmp_path / "ref.fa"),
                fastq1=str(tmp_path / "r1.fq"),
                fastq2=str(tmp_path / "r2.fq"),
                batch_size=16, records_per_bin=24, tls_batches=2)
    AlignWorkflow(WorkflowOptions(
        output_dir=str(tmp_path / "out0"), **base)).run()
    AlignWorkflow(WorkflowOptions(
        output_dir=str(tmp_path / "out8"), devices=8, **base)).run()
    b0 = (tmp_path / "out0" / "sorted.bam").read_bytes()
    b8 = (tmp_path / "out8" / "sorted.bam").read_bytes()
    assert b0 == b8
    # duplicates must actually have been marked (collective path active)
    import json
    s8 = json.loads((tmp_path / "out8" / "Stats" /
                     "BuildStats.json").read_text())
    assert s8.get("duplicates", 0) > 0


def test_genome_sharded_driver_matches_single_device(ref):
    """genome_sharded=True (G/S + halo packed planes per device) must
    reproduce the single-device results exactly — owner-masked scoring +
    psum over the shard axis."""
    from isaac_aligner_tpu.aligner import Aligner
    from isaac_aligner_tpu.parallel.sharded_aligner import ShardedAligner

    genome, seq, index = ref
    rng = np.random.default_rng(41)
    read_len = 48
    n = 16
    reads = []
    for i in range(n):
        p = int(rng.integers(0, 3000 - read_len))
        r = seq[p : p + read_len]
        if i % 2:
            r = dna.decode(dna.revcomp(dna.encode(r)))
        reads.append(r)
    batch = batch_from_reads([f"g{i}" for i in range(n)], reads)

    cfg = AlignConfig(seed_len=16, seed_offsets=(0, 16, 32))
    mesh = make_mesh(8, data=2, shard=4)
    one = Aligner.create(index, read_len=read_len, cfg=cfg)
    many = ShardedAligner.create_sharded(index, mesh=mesh, read_len=read_len,
                                         cfg=cfg, genome_sharded=True)
    # HBM claim: local plane strictly smaller than the full plane
    # (halo-dominated at this toy scale, ~G/S at WGS scale)
    assert many.genome_shards.gp.shape[1] < one.arrays.genome_packed.shape[0] \
        or index.genome.total_length < 4 * 8448
    r1 = one.align_batch_arrays(batch)
    r8 = many.align_batch_arrays(batch)
    for k in ("aligned", "start", "reverse", "mapq", "edit_distance",
              "mismatches"):
        np.testing.assert_array_equal(np.asarray(r1[k]), np.asarray(r8[k]),
                                      err_msg=f"field {k}")
    assert r1.get("cigar") == r8.get("cigar")
