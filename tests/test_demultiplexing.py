"""Demultiplexing: sample sheet, barcode resolution, per-sample BAMs."""

import json

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.demultiplexing import parse_sample_sheet, resolve_barcodes
from isaac_aligner_tpu.demultiplexing.resolver import UNKNOWN


def _sheet(tmp_path, text):
    p = tmp_path / "samples.csv"
    p.write_text(text)
    return p


def test_parse_sample_sheet(tmp_path):
    p = _sheet(tmp_path, "barcode,sample,project\nACGTACGT,sA,p1\nTTTTCCCC,sB,p1\n")
    specs = parse_sample_sheet(p)
    assert [s.sample for s in specs] == ["sA", "sB"]
    assert specs[0].components == ("ACGTACGT",)
    # dual index
    p2 = _sheet(tmp_path, "barcode,sample\nACGT-TTGC,dual\n")
    assert parse_sample_sheet(p2)[0].components == ("ACGT", "TTGC")
    # no-index
    p3 = _sheet(tmp_path, "barcode,sample\nnone,only\n")
    assert parse_sample_sheet(p3)[0].is_no_index


def test_resolve_barcodes_mismatch_budget(tmp_path):
    p = _sheet(tmp_path, "barcode,sample\nACGTACGT,sA\nTTTTCCCC,sB\n")
    specs = parse_sample_sheet(p)
    obs = np.stack([
        dna.encode("ACGTACGT"),   # exact A
        dna.encode("ACGTACGA"),   # 1mm -> A
        dna.encode("ACGTACAA"),   # 2mm -> unknown
        dna.encode("TTTTCCCC"),   # exact B
        dna.encode("NCGTACGT"),   # N = 1mm -> A
    ])
    out = resolve_barcodes(obs, specs, mismatches_per_component=1)
    assert list(out) == [0, 0, UNKNOWN, 1, 0]


def test_resolve_dual_index_per_component_budget(tmp_path):
    p = _sheet(tmp_path, "barcode,sample\nACGT-TTGC,sD\n")
    specs = parse_sample_sheet(p)
    obs = np.stack([
        dna.encode("ACGTTTGC"),   # exact
        dna.encode("ACGATTGA"),   # 1mm in each component -> ok
        dna.encode("ACAATTGC"),   # 2mm in first component -> unknown
    ])
    out = resolve_barcodes(obs, specs, mismatches_per_component=1)
    assert list(out) == [0, 0, UNKNOWN]


def test_workflow_demultiplexed_bams(tmp_path):
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions
    from isaac_aligner_tpu.io.bam import read_bam

    rng = np.random.default_rng(17)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 8000))
    (tmp_path / "ref.fa").write_text(">c\n" + seq + "\n")
    _sheet(tmp_path, "barcode,sample\nACGTACGT,alpha\nTTTTCCCC,beta\n")
    barcodes = ["ACGTACGT", "TTTTCCCC", "ACGTACGT", "GGGGGGGG"]
    with open(tmp_path / "r1.fq", "w") as f1, open(tmp_path / "i1.fq", "w") as fi:
        for i, bc in enumerate(barcodes):
            p = 100 + i * 500
            f1.write(f"@q{i}\n{seq[p:p+60]}\n+\n{'I'*60}\n")
            fi.write(f"@q{i}\n{bc}\n+\n{'I'*8}\n")
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(tmp_path / "out"),
        fastq1=str(tmp_path / "r1.fq"), batch_size=8,
        sample_sheet=str(tmp_path / "samples.csv"),
        barcode_fastq=str(tmp_path / "i1.fq")))
    wf.run()
    stats = json.loads((tmp_path / "out/Stats/DemultiplexingStats.json").read_text())
    assert stats == {"alpha": 2, "beta": 1, "unknown": 1}
    _, _, alpha = read_bam(tmp_path / "out/alpha/sorted.bam")
    assert sorted(r.qname for r in alpha) == ["q0", "q2"]
    _, _, beta = read_bam(tmp_path / "out/beta/sorted.bam")
    assert [r.qname for r in beta] == ["q1"]
    _, _, unk = read_bam(tmp_path / "out/unknown/sorted.bam")
    assert [r.qname for r in unk] == ["q3"]
    for r in alpha:
        assert r.tags["RG"] == ("Z", "alpha")
