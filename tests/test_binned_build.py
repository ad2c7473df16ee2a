"""Genomic-bin build phase (reference BinIndexMap + Build::sortBinParallel):
binned processing must produce byte-identical results to the in-memory
single-bin path, including duplicate marking and coordinate order."""

import numpy as np

from isaac_aligner_tpu.io.bam import read_bam
from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions


def _make_inputs(tmp_path):
    rng = np.random.default_rng(41)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 12_000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    r1s, r2s, names = [], [], []

    def add_pair(name, s):
        names.append(name)
        r1s.append(seq[s:s + 64])
        mate = seq[s + 236:s + 300]
        r2s.append("".join(comp[b] for b in reversed(mate)))

    for i, s in enumerate((500, 2500, 5000, 8000, 10_500)):
        add_pair(f"p{i}", s)
    # a duplicate copy of pair p1 (same coordinates, lower quality later)
    add_pair("dup", 2500)
    q = "I" * 64
    (tmp_path / "r1.fq").write_text(
        "".join(f"@{n}\n{r}\n+\n{q}\n" for n, r in zip(names, r1s)))
    (tmp_path / "r2.fq").write_text(
        "".join(f"@{n}\n{r}\n+\n{q}\n" for n, r in zip(names, r2s)))


def _run(tmp_path, out_name, records_per_bin):
    out = tmp_path / out_name
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
        batch_size=8, realign_gaps="no",
        records_per_bin=records_per_bin)).run()
    return out


def _bam_tuples(path):
    return [(r.qname, r.flag, r.rname, r.pos, r.mapq, r.cigar)
            for r in read_bam(path)[2]]


def test_binned_equals_single(tmp_path):
    _make_inputs(tmp_path)
    single = _run(tmp_path, "out_single", records_per_bin=10**9)
    binned = _run(tmp_path, "out_binned", records_per_bin=3)
    # several bins actually materialized
    bins = [d for d in (binned / "Temp" / "bins").glob("bin_*") if d.is_dir()]
    assert len(bins) >= 2, [p.name for p in bins]
    a = _bam_tuples(single / "sorted.bam")
    b = _bam_tuples(binned / "sorted.bam")
    assert a == b
    # exactly one duplicate pair marked in both
    import isaac_aligner_tpu.io.sam as sam
    dups_a = [t for t in a if t[1] & sam.FLAG_DUPLICATE]
    dups_b = [t for t in b if t[1] & sam.FLAG_DUPLICATE]
    assert len(dups_a) == 2 and dups_a == dups_b


def test_binned_with_unaligned(tmp_path):
    _make_inputs(tmp_path)
    # add an unalignable pair
    garbage = "".join("ACGT"[(i * 7 + 1) % 4] for i in range(64))
    with open(tmp_path / "r1.fq", "a") as f:
        f.write(f"@junk\n{garbage}\n+\n{'I' * 64}\n")
    with open(tmp_path / "r2.fq", "a") as f:
        f.write(f"@junk\n{garbage}\n+\n{'I' * 64}\n")
    binned = _run(tmp_path, "out_b2", records_per_bin=3)
    recs = _bam_tuples(binned / "sorted.bam")
    # unaligned records present and sorted to the very end
    assert recs[-1][2] == "*" or recs[-1][1] & 0x4
    assert len([t for t in recs if t[0] == "junk"]) == 2


def test_resume_through_binned_build(tmp_path):
    """--stop-at AlignDone then a fresh process --resume must finish the
    binned Build phase from the on-disk bins (reference checkpoint
    semantics, AlignWorkflowSerialization.hh)."""
    _make_inputs(tmp_path)
    out = tmp_path / "out"
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions
    opts = WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
        batch_size=8, realign_gaps="no", records_per_bin=3)
    AlignWorkflow(opts).run(stop_at="AlignDone")
    assert not (out / "sorted.bam").exists()
    assert list((out / "Temp" / "bins").glob("bin_*/chunk_*.cols"))

    # a brand-new workflow object resumes from the saved state
    wf2 = AlignWorkflow(opts)
    wf2.run(resume=True)
    assert wf2.state == "BamDone"
    recs = _bam_tuples(out / "sorted.bam")
    assert len(recs) == 12  # 6 pairs incl. the duplicate


def test_distribution_bins_hold_budget_on_skew(tmp_path):
    """Amplicon-style skew (most reads in 1% of the genome): the
    match-distribution bin cuts must hold every aligned bin near the
    record budget where equal spans would put ~everything in one bin
    (reference MatchDistribution.hh:43-107 + BinIndexMap.hh:44-96)."""
    import json

    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 100_000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    n = 400
    reads = []
    for i in range(n):
        if i % 10 == 0:   # 10% background spread over the genome
            p = int(rng.integers(0, 100_000 - 80))
        else:             # 90% in a 1kb hotspot (1% of the genome)
            p = 50_000 + int(rng.integers(0, 1000 - 80))
        reads.append(seq[p:p + 80])
    q = "I" * 80
    (tmp_path / "r1.fq").write_text(
        "".join(f"@s{i}\n{r}\n+\n{q}\n" for i, r in enumerate(reads)))

    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "r1.fq"), batch_size=64, realign_gaps="no",
        records_per_bin=50)).run()
    build = json.loads((out / "Stats" / "BuildStats.json").read_text())
    assert build["records"] == n
    # equal spans would put ~360 records in the hotspot's bin
    assert build["max_bin_records"] <= 2 * 50, build
    # and the output is still complete + sorted (spot check count)
    recs = read_bam(out / "sorted.bam")[2]
    assert len(recs) == n
