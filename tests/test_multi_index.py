"""Multi-index (contig-group) alignment: must match the single combined
index on placements, and merged MAPQ must account for cross-group
repeats."""

import numpy as np

from isaac_aligner_tpu.aligner import Aligner
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import ReadBatch
from isaac_aligner_tpu.parallel.multi_index import (MultiIndexAligner,
                                                    split_genome_groups)


def _seqs(seed=61):
    rng = np.random.default_rng(seed)
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    return mk(6000), mk(5000)


def _batch(rows, names):
    bases = np.stack(rows).astype(np.uint8)
    return ReadBatch(names=names, bases=bases,
                     quals=np.full(bases.shape, 35, np.uint8),
                     lengths=np.full(len(rows), bases.shape[1], np.int32))


def test_split_genome_groups():
    g = genome_from_sequences([("a", "A" * 100), ("b", "C" * 100),
                               ("c", "G" * 50)])
    groups = split_genome_groups(g.contigs, limit=150)
    assert groups == [["a"], ["b", "c"]]


def test_matches_single_index():
    sa, sb = _seqs()
    combined = genome_from_sequences([("cA", sa), ("cB", sb)])
    ga = genome_from_sequences([("cA", sa)])
    gb = genome_from_sequences([("cB", sb)])

    L = 80
    reads, names = [], []
    for s in (500, 3000):
        reads.append(combined.codes[s:s + L])
        names.append(f"a{s}")
    for s in (800, 4200):
        reads.append(gb.codes[s:s + L])
        names.append(f"b{s}")
    batch = _batch(reads, names)

    single = Aligner.create(build_index(combined, seed_len=32), read_len=L,
                            base_quality_cutoff=0).align_to_sam(batch)
    multi = MultiIndexAligner.create(
        [build_index(ga, seed_len=32), build_index(gb, seed_len=32)],
        read_len=L, base_quality_cutoff=0).align_to_sam(batch)

    for s_rec, m_rec in zip(single, multi):
        assert (s_rec.rname, s_rec.pos, s_rec.flag, s_rec.cigar) == \
            (m_rec.rname, m_rec.pos, m_rec.flag, m_rec.cigar)
        assert abs(s_rec.mapq - m_rec.mapq) <= 1  # f32 reassociation slack


def test_cross_group_repeat_collapses_mapq():
    """A sequence present once in EACH group: each group alone sees a
    unique hit, but the merged MAPQ must collapse to ~0."""
    rng = np.random.default_rng(67)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, 120))
    pad = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    sa = pad(2000) + core + pad(2000)
    sb = pad(1500) + core + pad(2500)
    ga = genome_from_sequences([("cA", sa)])
    gb = genome_from_sequences([("cB", sb)])

    L = 100
    read = ga.codes[2000 + 10 : 2000 + 10 + L]
    batch = _batch([read], ["rep"])
    multi = MultiIndexAligner.create(
        [build_index(ga, seed_len=32), build_index(gb, seed_len=32)],
        read_len=L, base_quality_cutoff=0)
    recs = multi.align_to_sam(batch)
    assert recs[0].is_mapped
    assert recs[0].mapq <= 3, f"cross-group repeat must be ambiguous, " \
                              f"got MAPQ {recs[0].mapq}"
    # each group ALONE would have called it unique
    solo = Aligner.create(build_index(ga, seed_len=32), read_len=L,
                          base_quality_cutoff=0).align_to_sam(batch)
    assert solo[0].mapq >= 50


def test_workflow_multi_reference(tmp_path):
    """CLI/workflow surface: comma-separated --reference entries align
    across contig groups into one sorted BAM."""
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    sa, sb = _seqs(seed=71)
    (tmp_path / "a.fa").write_text(f">cA\n{sa}\n")
    (tmp_path / "b.fa").write_text(f">cB\n{sb}\n")
    ga = genome_from_sequences([("cA", sa)])
    gb = genome_from_sequences([("cB", sb)])
    L = 80
    reads = {"a1000": "".join("ACGTN"[c] for c in ga.codes[1000:1000 + L]),
             "b2000": "".join("ACGTN"[c] for c in gb.codes[2000:2000 + L])}
    (tmp_path / "r.fq").write_text("".join(
        f"@{n}\n{r}\n+\n{'I' * L}\n" for n, r in reads.items()))

    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=f"{tmp_path}/a.fa,{tmp_path}/b.fa",
        output_dir=str(out), fastq1=str(tmp_path / "r.fq"),
        batch_size=8, realign_gaps="no")).run()
    from isaac_aligner_tpu.io.bam import read_bam
    recs = read_bam(out / "sorted.bam")[2]
    by = {r.qname: (r.rname, r.pos) for r in recs}
    assert by == {"a1000": ("cA", 1001), "b2000": ("cB", 2001)}


def test_paired_multi_index_matches_single():
    """Paired alignment across groups == paired against the combined
    index (placements, flags, proper pairs); merged scores close."""
    from isaac_aligner_tpu import dna
    from isaac_aligner_tpu.align.pairs import TlsStatic
    from isaac_aligner_tpu.aligner import PairedAligner
    from isaac_aligner_tpu.parallel.multi_index import MultiIndexPairedAligner

    sa, sb = _seqs(seed=91)
    combined = genome_from_sequences([("cA", sa), ("cB", sb)])
    ga = genome_from_sequences([("cA", sa)])
    gb = genome_from_sequences([("cB", sb)])
    L = 70
    tls = TlsStatic(min=200, max=400, mate_min=200, mate_max=400,
                    best0=1, best1=6)

    r1s, r2s, names = [], [], []
    for g, s in ((ga, 800), (gb, 1200), (ga, 4000)):
        r1s.append(g.codes[s:s + L])
        r2s.append(dna.revcomp(g.codes[s + 300 - L:s + 300]))
        names.append(f"p{s}")
    b1 = _batch(r1s, names)
    b2 = _batch(r2s, names)

    single = PairedAligner.create(build_index(combined, seed_len=32),
                                  read_len=L, base_quality_cutoff=0)
    single.tls = tls
    s_recs = single.align_to_sam(b1, b2)

    multi = MultiIndexPairedAligner.create(
        [build_index(ga, seed_len=32), build_index(gb, seed_len=32)],
        read_len=L, base_quality_cutoff=0)
    multi.tls = tls
    m_recs = multi.align_to_sam(b1, b2)

    assert len(s_recs) == len(m_recs)
    for s_rec, m_rec in zip(s_recs, m_recs):
        assert (s_rec.qname, s_rec.flag, s_rec.rname, s_rec.pos,
                s_rec.cigar, s_rec.tlen) ==             (m_rec.qname, m_rec.flag, m_rec.rname, m_rec.pos,
             m_rec.cigar, m_rec.tlen)
        assert abs(s_rec.mapq - m_rec.mapq) <= 1


def test_workflow_multi_reference_paired(tmp_path):
    from isaac_aligner_tpu import dna
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions
    sa, sb = _seqs(seed=73)
    (tmp_path / "a.fa").write_text(f">cA\n{sa}\n")
    (tmp_path / "b.fa").write_text(f">cB\n{sb}\n")
    ga = genome_from_sequences([("cA", sa)])
    gb = genome_from_sequences([("cB", sb)])
    L = 70
    with open(tmp_path / "r1.fq", "w") as f1, \
            open(tmp_path / "r2.fq", "w") as f2:
        for g, s, name in ((ga, 700, "pa"), (gb, 2100, "pb")):
            r1 = "".join("ACGTN"[c] for c in g.codes[s:s + L])
            r2 = "".join("ACGTN"[c] for c in
                         dna.revcomp(g.codes[s + 300 - L:s + 300]))
            f1.write(f"@{name}\n{r1}\n+\n{'I' * L}\n")
            f2.write(f"@{name}\n{r2}\n+\n{'I' * L}\n")
    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=f"{tmp_path}/a.fa,{tmp_path}/b.fa",
        output_dir=str(out),
        fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
        batch_size=8, realign_gaps="no",
        tls_override="200:300:400:30:30:1:6")).run()
    from isaac_aligner_tpu.io.bam import read_bam
    recs = read_bam(out / "sorted.bam")[2]
    import isaac_aligner_tpu.io.sam as sam
    by = {(r.qname, bool(r.flag & sam.FLAG_READ1)): (r.rname, r.pos)
          for r in recs}
    assert by[("pa", True)] == ("cA", 701)
    assert by[("pb", True)] == ("cB", 2101)
    assert all(r.flag & sam.FLAG_PROPER_PAIR for r in recs)
