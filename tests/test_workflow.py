"""Workflow + CLI end-to-end: FASTA + FASTQ -> sorted/dedup BAM with
checkpoint/resume (config 4 shape of the BASELINE ladder at toy scale)."""

import json

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.cli import main as cli_main
from isaac_aligner_tpu.io.bam import read_bam
from isaac_aligner_tpu.io import sam
from isaac_aligner_tpu.workflow.align import STATES, AlignWorkflow, WorkflowOptions

READ_LEN = 64


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wf")
    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    with open(d / "ref.fa", "w") as f:
        f.write(">chrW\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")

    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

    n = 300
    with open(d / "r1.fq", "w") as f1, open(d / "r2.fq", "w") as f2:
        for i in range(n):
            p = int(rng.integers(0, len(seq) - 800))
            t = int(np.clip(rng.normal(350, 25), 150, 700))
            r1 = seq[p : p + READ_LEN]
            r2 = rc(seq[p + t - READ_LEN : p + t])
            f1.write(f"@q{i}\n{r1}\n+\n{'I' * READ_LEN}\n")
            f2.write(f"@q{i}\n{r2}\n+\n{'I' * READ_LEN}\n")
    return d, seq, n


def test_full_workflow_and_resume(run_dir):
    d, seq, n = run_dir
    out = d / "out"
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(d / "ref.fa"), output_dir=str(out),
        fastq1=str(d / "r1.fq"), fastq2=str(d / "r2.fq"),
        batch_size=128))
    wf.run(stop_at="AlignDone")
    assert wf.state == "AlignDone"
    assert list((out / "Temp" / "bins").glob("bin_*/chunk_*.cols"))
    state = json.loads((out / "Temp" / "AlignerState.json").read_text())
    assert state["state"] == "AlignDone"

    # resume from checkpoint in a NEW workflow object (process restart)
    wf2 = AlignWorkflow(WorkflowOptions(
        reference=str(d / "ref.fa"), output_dir=str(out),
        fastq1=str(d / "r1.fq"), fastq2=str(d / "r2.fq"),
        batch_size=128))
    wf2.run(resume=True)
    assert wf2.state == "BamDone"

    # outputs
    assert (out / "sorted.bam").exists()
    assert (out / "sorted.bam.bai").exists()
    assert (out / "sorted.bam.md5").exists()
    assert (out / "Stats" / "MatchSelectorStats.json").exists()
    assert (out / "Stats" / "AlignmentReport.html").exists()

    text, refs, records = read_bam(out / "sorted.bam")
    assert refs[0] == ("chrW", 30000)
    assert len(records) == 2 * n
    # coordinate sorted
    mapped = [r for r in records if r.is_mapped]
    pos = [(r.pos) for r in mapped]
    assert pos == sorted(pos)
    stats = json.loads((out / "Stats" / "MatchSelectorStats.json").read_text())
    assert stats["aligned"] >= 0.98 * stats["total_reads"]
    assert stats["proper_pairs"] >= 0.95 * n


def test_cli_single_end(run_dir, tmp_path):
    d, seq, n = run_dir
    # small SE run through the CLI entry point
    rc = cli_main([
        "sort-reference", "-g", str(d / "ref.fa"),
        "-o", str(tmp_path / "idx")])
    assert rc == 0
    rc = cli_main([
        "align", "-r", str(tmp_path / "idx"),
        "-1", str(d / "r1.fq"),
        "-o", str(tmp_path / "se_out"), "--batch-size", "128"])
    assert rc == 0
    _, _, records = read_bam(tmp_path / "se_out" / "sorted.bam")
    assert len(records) == n
    assert sum(r.is_mapped for r in records) >= 0.98 * n


def test_fastq_input_streams(run_dir, tmp_path):
    """FASTQ inputs must flow through the workflow WITHOUT the whole-run
    in-RAM read cache (the out-of-core pipeline, reference
    SeedMemoryManager/BufferingFragmentStorage analog)."""
    d, seq, n = run_dir
    out = tmp_path / "stream_out"
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(d / "ref.fa"), output_dir=str(out),
        fastq1=str(d / "r1.fq"), fastq2=str(d / "r2.fq"),
        batch_size=64, memory_limit=8.0))
    wf.run()
    assert wf._reads_cache is None, "streaming path must not load all reads"
    _, _, records = read_bam(out / "sorted.bam")
    assert len(records) == 2 * n
    # FASTQ inputs get SYNTHESIZED tile stats (one tile per batch —
    # reference FastqDataSource.hh:41-118 synthesizes tiles the same way)
    stats = json.loads(
        (out / "Stats" / "MatchSelectorStats.json").read_text())
    tiles = stats.get("tiles", [])
    assert tiles, "FASTQ runs must report synthesized tile stats"
    assert sum(t["total"] for t in tiles) == 2 * n
    assert {t["read"] for t in tiles} == {1, 2}


def test_streaming_output_matches_batchsize_variation(run_dir, tmp_path):
    """Record content must not depend on batch size (pure streaming)."""
    d, seq, n = run_dir
    outs = []
    for bs in (64, 256):
        out = tmp_path / f"bs{bs}"
        AlignWorkflow(WorkflowOptions(
            reference=str(d / "ref.fa"), output_dir=str(out),
            fastq1=str(d / "r1.fq"), fastq2=str(d / "r2.fq"),
            batch_size=bs)).run()
        _, _, recs = read_bam(out / "sorted.bam")
        outs.append([(r.qname, r.flag, r.rname, r.pos, r.mapq, r.cigar,
                      r.tlen) for r in recs])
    assert outs[0] == outs[1]
