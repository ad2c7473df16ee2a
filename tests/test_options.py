"""Option-breadth parity: --ignore-missing-bcls/-filters graceful
degradation, --mate-drift-range, --bam-pessimistic-mapq
(reference manual.md:279,397-400,572-575)."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.io import bcl
from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions


def _mini_run(tmp_path, n_cycles=80):
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    reads = [seq[100 : 100 + n_cycles], seq[900 : 900 + n_cycles]]
    q = np.full((2, n_cycles), 30, np.uint8)
    info = bcl.RunInfo(instrument="M", run_number="1", flowcell="FC",
                       reads=[bcl.ReadSegment(number=1, num_cycles=n_cycles,
                                              is_indexed=False)],
                       lane_count=1)
    bcl.write_run_folder(tmp_path / "run", info, lane=1, tile=1101,
                         segments=[(np.stack([dna.encode(r) for r in reads]), q)])
    return seq


def test_ignore_missing_bcls(tmp_path):
    seq = _mini_run(tmp_path)
    # remove one mid-read cycle file
    lane = tmp_path / "run" / "Data" / "Intensities" / "BaseCalls" / "L001"
    victim = next((lane / "C20.1").glob("s_1_1101.*"))
    victim.unlink()
    with pytest.raises(FileNotFoundError):
        bcl.load_tile(tmp_path / "run", 1, 1101)
    td = bcl.load_tile(tmp_path / "run", 1, 1101, ignore_missing_bcls=True)
    # cycle 20 became N / q0 for every cluster
    assert (td.read_bases[0][:, 19] == 4).all()
    assert (td.read_quals[0][:, 19] == 0).all()
    # the run still aligns end to end (one N = one edit)
    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        run_folder=str(tmp_path / "run"), batch_size=8,
        ignore_missing_bcls=True, realign_gaps="no")).run()
    from isaac_aligner_tpu.io.bam import read_bam
    recs = read_bam(out / "sorted.bam")[2]
    assert sum(r.is_mapped for r in recs) == 2


def test_ignore_missing_filters(tmp_path):
    _mini_run(tmp_path)
    lane = tmp_path / "run" / "Data" / "Intensities" / "BaseCalls" / "L001"
    for f in lane.glob("*.filter"):
        f.unlink()
    inten = tmp_path / "run" / "Data" / "Intensities" / "L001"
    if inten.is_dir():
        for f in inten.glob("*.filter"):
            f.unlink()
    with pytest.raises(FileNotFoundError):
        bcl.load_tile(tmp_path / "run", 1, 1101)
    td = bcl.load_tile(tmp_path / "run", 1, 1101, ignore_missing_filters=True)
    assert td.pf.all()


def test_mate_drift_range(tmp_path):
    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")

    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

    with open(tmp_path / "r1.fq", "w") as f1, \
            open(tmp_path / "r2.fq", "w") as f2:
        for i in range(4):
            p = 200 + i * 1000
            f1.write(f"@p{i}\n{seq[p:p+48]}\n+\n{'I'*48}\n")
            f2.write(f"@p{i}\n{rc(seq[p+252:p+300])}\n+\n{'I'*48}\n")
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(tmp_path / "out"),
        fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
        batch_size=8, tls_override="200:300:400:30:30:1:6",
        mate_drift_range=50, realign_gaps="no"))
    wf.run(stop_at="TlsDone")
    assert wf.tls.mate_min == 250 and wf.tls.mate_max == 350
    assert wf.tls.min == 200 and wf.tls.max == 400


def test_pessimistic_mapq(tmp_path):
    from isaac_aligner_tpu.io.bam import read_bam
    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 8000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")

    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

    with open(tmp_path / "r1.fq", "w") as f1, \
            open(tmp_path / "r2.fq", "w") as f2:
        for i in range(8):
            p = 200 + i * 900
            f1.write(f"@p{i}\n{seq[p:p+48]}\n+\n{'I'*48}\n")
            f2.write(f"@p{i}\n{rc(seq[p+252:p+300])}\n+\n{'I'*48}\n")

    outs = {}
    for name, pess in (("opt", False), ("pess", True)):
        out = tmp_path / name
        AlignWorkflow(WorkflowOptions(
            reference=str(tmp_path / "ref.fa"), output_dir=str(out),
            fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
            batch_size=8, tls_override="200:300:400:30:30:1:6",
            pessimistic_mapq=pess, realign_gaps="no")).run()
        outs[name] = read_bam(out / "sorted.bam")[2]

    checked = 0
    for ro, rp in zip(outs["opt"], outs["pess"]):
        assert ro.qname == rp.qname and ro.pos == rp.pos
        if ro.is_mapped and "AS" in ro.tags:
            sm = ro.tags["SM"][1]
            as_ = ro.tags["AS"][1]
            assert ro.mapq == min(60, max(sm, as_))
            assert rp.mapq == min(60, min(sm, as_))
            checked += 1
    assert checked >= 8
