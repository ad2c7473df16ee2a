"""BAM-input realignment (reference BamSeedSource analog): align FASTQ ->
BAM, then realign from that BAM and get the same alignments back."""

import numpy as np
import pytest

from isaac_aligner_tpu.io.bam import read_bam
from isaac_aligner_tpu.io.bam_input import reads_from_bam
from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions


def test_realign_from_bam_roundtrip(tmp_path):
    rng = np.random.default_rng(33)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 10000))
    (tmp_path / "ref.fa").write_text(">cB\n" + seq + "\n")

    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

    n = 40
    with open(tmp_path / "r1.fq", "w") as f1, open(tmp_path / "r2.fq", "w") as f2:
        for i in range(n):
            p = int(rng.integers(0, 9000))
            t = int(np.clip(rng.normal(300, 20), 150, 600))
            f1.write(f"@b{i}\n{seq[p:p+60]}\n+\n{'I'*60}\n")
            f2.write(f"@b{i}\n{rc(seq[p+t-60:p+t])}\n+\n{'I'*60}\n")

    out1 = tmp_path / "first"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out1),
        fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
        batch_size=64)).run()

    # read batches back from the BAM: original-strand sequences
    b1, b2 = reads_from_bam(out1 / "sorted.bam")
    assert b2 is not None and b1.count == n

    out2 = tmp_path / "second"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out2),
        bam_input=str(out1 / "sorted.bam"), batch_size=64)).run()

    _, _, first = read_bam(out1 / "sorted.bam")
    _, _, second = read_bam(out2 / "sorted.bam")
    key = lambda r: (r.qname, r.flag & 0xC0)
    pos1 = {key(r): (r.pos, r.flag & 0x10) for r in first if r.is_mapped}
    pos2 = {key(r): (r.pos, r.flag & 0x10) for r in second if r.is_mapped}
    assert pos1 == pos2


def test_streaming_matches_whole_file(tmp_path):
    """iter_bam_batches (BGZF-chunk streaming + cross-chunk pair cache)
    yields the same read set as the whole-file loader."""
    from isaac_aligner_tpu.io.bam_input import iter_bam_batches

    rng = np.random.default_rng(44)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    (tmp_path / "ref.fa").write_text(">cS\n" + seq + "\n")

    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

    n = 300
    with open(tmp_path / "r1.fq", "w") as f1, \
            open(tmp_path / "r2.fq", "w") as f2:
        for i in range(n):
            p = int(rng.integers(0, 19000))
            t = int(np.clip(rng.normal(300, 20), 150, 900))
            p = min(p, 20000 - t - 1)
            f1.write(f"@s{i}\n{seq[p:p+60]}\n+\n{'I'*60}\n")
            f2.write(f"@s{i}\n{rc(seq[p+t-60:p+t])}\n+\n{'I'*60}\n")
    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
        batch_size=64)).run()

    whole1, whole2 = reads_from_bam(out / "sorted.bam")
    got = {}
    for b1, b2, _ in iter_bam_batches(out / "sorted.bam", 64):
        for i in range(b1.n_valid):
            got[b1.names[i]] = (
                b1.bases[i, : b1.lengths[i]].tobytes(),
                b2.bases[i, : b2.lengths[i]].tobytes())
    assert len(got) == whole1.count == n
    for i, nm in enumerate(whole1.names):
        w1 = whole1.bases[i, : whole1.lengths[i]].tobytes()
        w2 = whole2.bases[i, : whole2.lengths[i]].tobytes()
        assert got[nm] == (w1, w2), nm
