"""Round-4 option breadth: --keep-unaligned, --mapq-threshold,
--qscore-bin, --variable-fastq-read-length, --bin-regex,
--bam-header-tag, --gapped-mismatches/--semialigned-gap-limit plumbing,
--version (reference AlignOptions flag set, manual.md:489-590)."""

import json

import numpy as np
import pytest

from isaac_aligner_tpu.cli import main as cli_main
from isaac_aligner_tpu.io.bam import read_bam
from isaac_aligner_tpu.io import sam
from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions


@pytest.fixture(scope="module")
def case(tmp_path_factory):
    td = tmp_path_factory.mktemp("opts")
    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 9000))
    (td / "ref.fa").write_text(f">cA\n{seq[:5000]}\n>cB\n{seq[5000:]}\n")
    with open(td / "r1.fq", "w") as f:
        for i in range(24):
            p = int(rng.integers(0, 8900))
            s = seq[p : p + 70]
            if i % 6 == 1:               # unalignable junk
                s = "".join("ACGT"[(j * 7 + i) % 4] for j in range(70))
            f.write(f"@u{i}\n{s}\n+\n{'I' * 70}\n")
    return td, seq


def _run(td, name, **kw):
    out = td / name
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(td / "ref.fa"), output_dir=str(out),
        fastq1=str(td / "r1.fq"), batch_size=8, realign_gaps="no", **kw))
    wf.run()
    return out, wf


def test_keep_unaligned_placement(case):
    td, _ = case
    out_b, _ = _run(td, "kb")                     # back (default)
    _, _, rec_b = read_bam(out_b / "sorted.bam")
    unmapped = [i for i, r in enumerate(rec_b) if r.flag & sam.FLAG_UNMAPPED]
    assert unmapped and min(unmapped) > 0
    assert unmapped == list(range(len(rec_b) - len(unmapped), len(rec_b)))

    out_d, _ = _run(td, "kd", keep_unaligned="discard")
    _, _, rec_d = read_bam(out_d / "sorted.bam")
    assert all(not (r.flag & sam.FLAG_UNMAPPED) for r in rec_d)
    assert len(rec_d) == len(rec_b) - len(unmapped)

    out_f, _ = _run(td, "kf", keep_unaligned="front")
    _, _, rec_f = read_bam(out_f / "sorted.bam")
    got = [r.flag & sam.FLAG_UNMAPPED != 0 for r in rec_f]
    assert got[: len(unmapped)] == [True] * len(unmapped)
    assert not any(got[len(unmapped) :])


def test_mapq_threshold_filters_templates(case):
    td, _ = case
    out_all, _ = _run(td, "mq0")
    _, _, rec_all = read_bam(out_all / "sorted.bam")
    out_f, _ = _run(td, "mq40", mapq_threshold=40)
    _, _, rec_f = read_bam(out_f / "sorted.bam")
    kept = [r for r in rec_f if not (r.flag & sam.FLAG_UNMAPPED)]
    assert kept and all(r.mapq >= 40 for r in kept)
    low = [r for r in rec_all if not (r.flag & sam.FLAG_UNMAPPED)
           and r.mapq < 40]
    # every below-bar record became unaligned, none silently vanished
    assert len(kept) == len([r for r in rec_all
                             if not (r.flag & sam.FLAG_UNMAPPED)]) - len(low)


def test_qscore_bin_table():
    o = WorkflowOptions(reference="x", output_dir="y", qscore_bin=True)
    t = o.qscore_table()
    assert t[2] == 6 and t[9] == 6 and t[15] == 15 and t[37] == 37
    assert t[40] == 40 and t[63] == 40
    o2 = WorkflowOptions(reference="x", output_dir="y", qscore_bin=True,
                         qscore_bin_values="0-63:20")
    assert (np.asarray(o2.qscore_table()) == 20).all()


def test_variable_read_length_guard(case, tmp_path):
    td, seq = case
    with open(tmp_path / "ragged.fq", "w") as f:
        f.write(f"@a\n{seq[100:170]}\n+\n{'I' * 70}\n")
        f.write(f"@b\n{seq[300:340]}\n+\n{'I' * 40}\n")
    out = tmp_path / "rg"
    kw = dict(reference=str(td / "ref.fa"), output_dir=str(out),
              fastq1=str(tmp_path / "ragged.fq"), batch_size=8,
              realign_gaps="no")
    with pytest.raises(ValueError, match="variable-fastq-read-length"):
        AlignWorkflow(WorkflowOptions(**kw)).run()
    AlignWorkflow(WorkflowOptions(
        **{**kw, "output_dir": str(tmp_path / "rg2")},
        variable_read_length=True)).run()
    _, _, recs = read_bam(tmp_path / "rg2" / "sorted.bam")
    assert len(recs) == 2


def test_bin_regex_and_header_tags(case):
    td, _ = case
    out_all, _ = _run(td, "brx_all", records_per_bin=8,
                      keep_unaligned="discard")
    _, _, rec_all = read_bam(out_all / "sorted.bam")
    out, _ = _run(td, "brx", bin_regex="cA:.*", records_per_bin=8,
                  keep_unaligned="discard",
                  bam_header_tags=("@CO\tround4-test",))
    header, _, recs = read_bam(out / "sorted.bam")
    assert "@CO\tround4-test" in header
    assert recs and any(r.rname == "cA" for r in recs)
    # bins described as cB:* were dropped; every missing record is a cB
    # one (a bin STARTING in cA may straddle into cB — its description is
    # the start contig's, like the reference's per-bin descriptions)
    assert len(recs) < len(rec_all)
    got = {(r.qname, r.rname, r.pos) for r in recs}
    missing = [r for r in rec_all if (r.qname, r.rname, r.pos) not in got]
    assert missing and all(r.rname == "cB" for r in missing)


def test_gapped_knob_plumbing(case):
    td, _ = case
    # absurd trigger disables gapped polish; run must still complete
    out, wf = _run(td, "gk", gapped_mismatches=250,
                   semialigned_gap_limit=0)
    _, _, recs = read_bam(out / "sorted.bam")
    assert recs


def test_version_flag(capsys):
    with pytest.raises(SystemExit) as e:
        cli_main(["--version"])
    assert e.value.code == 0
    assert "isaac_aligner_tpu" in capsys.readouterr().out


def test_mapq_threshold_paired_seq_consistency(case, tmp_path):
    """Dropped reverse-aligned templates must emit FORWARD seq with
    FLAG_REVERSE clear (round-4 review finding)."""
    from isaac_aligner_tpu import dna as _dna
    td, seq = case
    rc = lambda s: s.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    reads = []
    for i in range(8):
        p = 200 + i * 400
        frag = seq[p : p + 300]
        # heavy mutations keep MAPQ low but alignable
        s1 = list(frag[:70])
        for j in range(0, 70, 9):
            s1[j] = "ACGT"[("ACGT".index(s1[j]) + 1) % 4]
        reads.append(("".join(s1), rc(frag[-70:])))
    with open(tmp_path / "p1.fq", "w") as f1, \
         open(tmp_path / "p2.fq", "w") as f2:
        for i, (a, b) in enumerate(reads):
            f1.write(f"@m{i}\n{a}\n+\n{'I' * 70}\n")
            f2.write(f"@m{i}\n{b}\n+\n{'I' * 70}\n")
    out = tmp_path / "mqp"
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(td / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "p1.fq"), fastq2=str(tmp_path / "p2.fq"),
        batch_size=8, realign_gaps="no", mapq_threshold=61))
    wf.run()   # threshold 61 > cap drops EVERY template
    _, _, recs = read_bam(out / "sorted.bam")
    originals = {}
    for i, (a, b) in enumerate(reads):
        originals[(f"m{i}", True)] = a
        originals[(f"m{i}", False)] = b
    for r in recs:
        assert r.flag & sam.FLAG_UNMAPPED
        assert not (r.flag & sam.FLAG_REVERSE)
        want = originals[(r.qname, bool(r.flag & sam.FLAG_READ1))]
        assert r.seq == want, (r.qname, "seq must be the original forward read")


def test_realigned_gaps_clamp(case, tmp_path):
    """--realigned-gaps-per-fragment beyond the static slot capacity must
    clamp (with a log), not crash the Build phase."""
    td, _ = case
    out = tmp_path / "clamp"
    AlignWorkflow(WorkflowOptions(
        reference=str(td / "ref.fa"), output_dir=str(out),
        fastq1=str(td / "r1.fq"), batch_size=8,
        realign_gaps="all", realigned_gaps_per_fragment=9)).run()
    _, _, recs = read_bam(out / "sorted.bam")
    assert recs


def test_per_tile_tls(tmp_path):
    """--per-tile-tls learns a model per BCL tile; tiles with different
    insert sizes get different windows and both align as proper pairs."""
    from isaac_aligner_tpu import dna as _dna
    from isaac_aligner_tpu.io import bcl

    rng = np.random.default_rng(31)
    seq_codes = rng.integers(0, 4, 30000).astype(np.uint8)
    (tmp_path / "ref.fa").write_text(
        ">cT\n" + "".join("ACGT"[i] for i in seq_codes) + "\n")
    n_cycles = 60

    def tile_segments(tlen_mean, n=64):
        r1 = np.zeros((n, n_cycles), np.uint8)
        r2 = np.zeros((n, n_cycles), np.uint8)
        for i in range(n):
            p = int(rng.integers(100, 29000))
            t = tlen_mean + int(rng.integers(-10, 11))
            r1[i] = seq_codes[p : p + n_cycles]
            m = seq_codes[p + t - n_cycles : p + t]
            r2[i] = np.where(m[::-1] < 4, 3 - m[::-1], m[::-1])
        q = np.full((n, n_cycles), 35, np.uint8)
        return [(r1, q), (r2, q)]

    info = bcl.RunInfo(
        instrument="M", run_number="1", flowcell="FC",
        reads=[bcl.ReadSegment(number=1, num_cycles=n_cycles,
                               is_indexed=False),
               bcl.ReadSegment(number=2, num_cycles=n_cycles,
                               is_indexed=False)],
        lane_count=1)
    # tile 1101: ~200bp inserts; tile 1102: ~400bp inserts
    bcl.write_run_folder(tmp_path / "run", info, lane=1, tile=1101,
                         segments=tile_segments(200))
    bcl.write_run_folder(tmp_path / "run", info, lane=1, tile=1102,
                         segments=tile_segments(400))

    out = tmp_path / "ptt"
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        run_folder=str(tmp_path / "run"), batch_size=32,
        realign_gaps="no", per_tile_tls=True, tls_batches=2))
    wf.run()
    per_tile = wf._stats.get("tls_per_tile", {})
    assert set(per_tile) == {"1:1101", "1:1102"}
    assert per_tile["1:1101"]["max"] < per_tile["1:1102"]["min"], per_tile
    _, _, recs = read_bam(out / "sorted.bam")
    proper = [r for r in recs if r.flag & sam.FLAG_PROPER_PAIR]
    # both tiles' pairs are proper under their OWN models
    assert len(proper) >= 0.9 * len(recs), (len(proper), len(recs))
