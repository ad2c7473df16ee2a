"""Round-4 late option breadth: --ignore-neighbors, --ignore-repeats,
--scatter-repeats, --avoid-smith-waterman, --realign-dodgy,
--realign-vigorously, --cleanup-intermediary, --memory-control,
--allow-empty-flowcells, --lane-number-max (FASTQ base-calls dirs),
--bam-pu-format/--reference-name/--description, --stats-image-format,
--buffer-bins/--pre-sort-bins, --base-calls-format,
--clusters-at-a-time, --tiles, --help-defaults/--help-md
(reference AlignOptions, manual.md:271-564)."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.align.pipeline import (AlignConfig,
                                              default_seed_offsets)
from isaac_aligner_tpu.aligner import Aligner
from isaac_aligner_tpu.cli import main as cli_main
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io import sam
from isaac_aligner_tpu.io.bam import read_bam
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import ReadBatch
from isaac_aligner_tpu.utils.errors import InvalidOptionError, MemoryError_
from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions


def _batch(bases_rows):
    bases = np.stack(bases_rows).astype(np.uint8)
    quals = np.full(bases.shape, 35, np.uint8)
    return ReadBatch(names=[f"r{i}" for i in range(len(bases_rows))],
                     bases=bases, quals=quals,
                     lengths=np.full(len(bases_rows), bases.shape[1],
                                     np.int32))


# -- device-side flags ------------------------------------------------------

def test_scatter_repeats_spreads_ties():
    rng = np.random.default_rng(11)
    uniq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    copy = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    # two EXACT copies of a 200bp unit -> every read from it has two
    # bitwise-equal best placements
    seq = uniq[:1000] + copy + uniq[1000:2000] + copy + uniq[2000:]
    genome = genome_from_sequences([("cS", seq)])
    index = build_index(genome, seed_len=32)
    read_len = 64
    rows = [genome.codes[1000 + o : 1000 + o + read_len] for o in
            [0, 8, 16, 24, 32, 40, 48, 56, 64, 72, 80, 88, 96, 104, 112,
             120]]
    batch = _batch(rows)

    def starts(scatter):
        cfg = AlignConfig(seed_len=32,
                          seed_offsets=default_seed_offsets(read_len, 32),
                          scatter_repeats=scatter)
        al = Aligner.create(index, read_len=read_len, cfg=cfg,
                            base_quality_cutoff=0)
        recs = al.align_to_sam(batch)
        assert all(not (r.flag & 4) for r in recs)
        return [r.pos for r in recs]

    base = starts(False)
    # deterministic pick always takes the FIRST (lowest-position) copy
    assert all(p <= 1000 + 200 for p in base)
    spread = starts(True)
    in_first = sum(p <= 1200 for p in spread)
    # the hash spreads the pile across both copies (both sides hit)
    assert 0 < in_first < len(spread)
    # and re-running is deterministic
    assert spread == starts(True)


def test_ignore_repeats_enables_inexact_on_repeat_seeds():
    rng = np.random.default_rng(12)
    uniq = "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 32))
    # 4 copies of one 32-mer: over the align-time repeat threshold of 2
    parts, p = [], 0
    for cut in (800, 1600, 2400, 3200):
        parts.append(uniq[p:cut] + unit)
        p = cut
    parts.append(uniq[p:])
    genome = genome_from_sequences([("cR", "".join(parts))])
    index = build_index(genome, seed_len=32)
    batch = _batch([dna.encode(unit)])   # the read IS the repeat 32-mer

    def aligned(ignore):
        cfg = AlignConfig(seed_len=32, seed_offsets=(0,),
                          repeat_threshold=2, max_hits_per_seed=2,
                          neighborhood_size_threshold=8,
                          ignore_repeats=ignore)
        al = Aligner.create(index, read_len=32, cfg=cfg,
                            base_quality_cutoff=0)
        return not (al.align_to_sam(batch)[0].flag & 4)

    # default: the exact repeat blocks the seed entirely (dodgy MAPQ-0
    # handling happens only when hits are tracked; here count>threshold)
    assert not aligned(False)
    # --ignore-repeats: the inexact (Hamming<=1) pass scans the prefix
    # block anyway and recovers a placement
    assert aligned(True)


def test_ignore_neighbors_counts_flagged_seeds_as_anchors():
    rng = np.random.default_rng(13)
    uniq = "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 32))
    # a copy with ONE SNP -> the original 32-mer gets the neighbor bit
    snp = ("A" if unit[10] != "A" else "C")
    unit2 = unit[:10] + snp + unit[11:]
    seq = uniq[:1000] + unit + uniq[1000:2000] + unit2 + uniq[2000:]
    genome = genome_from_sequences([("cN", seq)])
    index = build_index(genome, seed_len=32, annotate_neighbors=True)
    batch = _batch([dna.encode(unit)])

    def mapq(ignore):
        cfg = AlignConfig(seed_len=32, seed_offsets=(0,),
                          ignore_neighbors=ignore)
        al = Aligner.create(index, read_len=32, cfg=cfg,
                            base_quality_cutoff=0)
        r = al.align_to_sam(batch)[0]
        assert not (r.flag & 4)
        return r.mapq

    # single seed, neighbor-flagged: not well-anchored -> MAPQ floor
    assert mapq(False) == 0
    # --ignore-neighbors: the same hit counts as a clean anchor
    assert mapq(True) > 0


def test_makes_sense_to_gap_align():
    from isaac_aligner_tpu.align.gapped import makes_sense_to_gap_align
    rng = np.random.default_rng(14)
    db = rng.integers(0, 4, 115).astype(np.int32)
    # a 3-base deletion: query skips db[40:43] -> two confirmed offsets
    q = np.concatenate([db[:40], db[43:103]]).astype(np.int32)
    assert makes_sense_to_gap_align(q, db)
    # scattered SNPs, no shift: only one confirmed offset
    q2 = db[:100].copy()
    for p in (7, 23, 41, 59, 77, 93):
        q2[p] = (q2[p] + 1) % 4
    assert not makes_sense_to_gap_align(q2, db)


# -- realign flags ----------------------------------------------------------

def _realign_fb():
    from isaac_aligner_tpu.build.records import (FragmentBatch,
                                                 update_from_sam_records)
    rng = np.random.default_rng(15)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 800))
    genome = genome_from_sequences([("c1", seq)])
    codes = genome.codes
    # donor carries a real 3bp deletion at local pos 130; victim spans
    # the same locus ungapped (same haplotype) and has NO SM tag
    read = dna.decode(np.concatenate([codes[100:130], codes[133:163]]))
    donor = sam.SamRecord(qname="d0", flag=0, rname="c1", pos=101,
                          mapq=50, cigar="30M3D30M", seq=read,
                          qual="I" * 60)
    donor.set_tag("SM", "i", 50)
    vread = dna.decode(np.concatenate([codes[90:130], codes[133:153]]))
    victim = sam.SamRecord(qname="v0", flag=0, rname="c1", pos=91,
                           mapq=0, cigar="60M", seq=vread, qual="I" * 60)
    recs = [donor, victim]
    fb = FragmentBatch.empty(2, 60, name_w=4, max_cigar=16)
    for i, r in enumerate(recs):
        b = r.qname.encode()
        fb.name_bytes[i, : len(b)] = np.frombuffer(b, np.uint8)
        fb.name_len[i] = len(b)
        s = dna.encode(r.seq)
        fb.seq[i, : len(s)] = s
        fb.qual[i, : len(s)] = 30
        fb.length[i] = len(s)
    update_from_sam_records(fb, np.arange(2), recs, genome.contigs)
    return fb, genome


def test_realign_dodgy_gates_scoreless_records():
    from isaac_aligner_tpu.build.realign import realign_batch
    from isaac_aligner_tpu.build.records import _ABSENT

    fb, genome = _realign_fb()
    assert fb.sm[1] == _ABSENT   # the victim is score-less ("dodgy")
    assert realign_batch(fb, genome, None, realign_dodgy=False) == 0

    fb2, genome = _realign_fb()
    assert realign_batch(fb2, genome, None, realign_dodgy=True) == 1
    ops = fb2.cigar_ops[1, : fb2.n_cigar[1]]
    assert any((op & 0xF) == 2 for op in ops)   # gained the deletion


# -- workflow flags ---------------------------------------------------------

@pytest.fixture(scope="module")
def wf_case(tmp_path_factory):
    td = tmp_path_factory.mktemp("r4opts")
    rng = np.random.default_rng(16)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 8000))
    (td / "ref.fa").write_text(f">cA\n{seq}\n")
    with open(td / "r1.fq", "w") as f:
        for i in range(24):
            p = int(rng.integers(0, 7900))
            f.write(f"@u{i}\n{seq[p : p + 70]}\n+\n{'I' * 70}\n")
    return td, seq


def _run(td, name, **kw):
    out = td / name
    kw.setdefault("realign_gaps", "no")
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(td / "ref.fa"), output_dir=str(out),
        fastq1=str(td / "r1.fq"), batch_size=8, **kw))
    wf.run()
    return out, wf


def test_cleanup_intermediary(wf_case):
    td, _ = wf_case
    out, wf = _run(td, "keepbins")
    assert (out / "Temp" / "bins").exists()
    out2, wf2 = _run(td, "cleanbins", cleanup_intermediary=True)
    assert not (out2 / "Temp" / "bins").exists()
    h1 = (out / "sorted.bam.md5").read_text()
    h2 = (out2 / "sorted.bam.md5").read_text()
    assert h1 == h2   # cleanup changes nothing about the output


def test_allow_empty_flowcells(wf_case, tmp_path):
    td, _ = wf_case
    empty = tmp_path / "empty.fq"
    empty.write_text("")
    with pytest.raises(ValueError, match="no reads"):
        AlignWorkflow(WorkflowOptions(
            reference=str(td / "ref.fa"), output_dir=str(tmp_path / "o1"),
            fastq1=str(empty), batch_size=8)).run()
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(td / "ref.fa"), output_dir=str(tmp_path / "o2"),
        fastq1=str(empty), batch_size=8, allow_empty_flowcells=True))
    wf.run()
    _, contigs, recs = read_bam(tmp_path / "o2" / "sorted.bam")
    assert recs == [] and contigs


def test_fastq_basecalls_directory(wf_case, tmp_path):
    td, seq = wf_case
    bc = tmp_path / "BaseCalls"
    bc.mkdir()
    rng = np.random.default_rng(17)
    for lane in (1, 2, 9):   # lane 9 is beyond --lane-number-max 8
        with open(bc / f"lane{lane}_read1.fastq", "w") as f:
            for i in range(8):
                p = int(rng.integers(0, 7900))
                f.write(f"@L{lane}r{i}\n{seq[p : p + 70]}\n+\n{'I' * 70}\n")
    out = tmp_path / "dirout"
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(td / "ref.fa"), output_dir=str(out),
        fastq1=str(bc), batch_size=8))
    wf.run()
    _, _, recs = read_bam(out / "sorted.bam")
    names = {r.qname for r in recs}
    assert any(n.startswith("L1r") for n in names)
    assert any(n.startswith("L2r") for n in names)
    assert not any(n.startswith("L9r") for n in names)


def test_bam_header_metadata(wf_case):
    td, _ = wf_case
    out, _ = _run(td, "hdr", bam_pu_format="%F.%L.%B",
                  description="test run", reference_name="hg-mini")
    header, _, _ = read_bam(out / "sorted.bam")
    assert "PU:unknown.all.sample" in header
    assert "DS:test run" in header
    assert "@CO\tREFERENCE:hg-mini" in header


def test_stats_image_format_none(wf_case):
    td, _ = wf_case
    out, _ = _run(td, "noimg", stats_image_format="none")
    html = (out / "Stats" / "AlignmentReport.html").read_text()
    assert "<svg" not in html
    out2, _ = _run(td, "img")
    assert "<svg" in (out2 / "Stats" / "AlignmentReport.html").read_text()


def test_buffer_and_presort_identical_output(wf_case):
    td, _ = wf_case
    base, _ = _run(td, "bb_def")
    nobuf, _ = _run(td, "bb_off", buffer_bins=False, pre_sort_bins=False)
    assert (base / "sorted.bam.md5").read_text() == \
        (nobuf / "sorted.bam.md5").read_text()


def test_clusters_at_a_time_forces_batch(wf_case):
    td, _ = wf_case
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(td / "ref.fa"), output_dir=str(td / "caat"),
        fastq1=str(td / "r1.fq"), batch_size=8, memory_limit=64.0,
        clusters_at_a_time=16))
    wf._fit_batch_size()
    assert wf.opts.batch_size == 16


def test_base_calls_format_validation(wf_case, tmp_path):
    td, _ = wf_case
    with pytest.raises(InvalidOptionError, match="plain FASTQ"):
        AlignWorkflow(WorkflowOptions(
            reference=str(td / "ref.fa"), output_dir=str(tmp_path / "x"),
            fastq1=str(td / "r1.fq"),
            base_calls_format="fastq-gz")).run()
    with pytest.raises(InvalidOptionError, match="needs --run-folder"):
        AlignWorkflow(WorkflowOptions(
            reference=str(td / "ref.fa"), output_dir=str(tmp_path / "y"),
            fastq1=str(td / "r1.fq"), base_calls_format="bcl")).run()


def test_memory_control_strict_raises(tmp_path):
    rng = np.random.default_rng(18)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 8000))
    (tmp_path / "ref.fa").write_text(f">cA\n{seq}\n")
    with open(tmp_path / "hot.fq", "w") as f:
        for i in range(24):   # every read on ONE locus: unsplittable bin
            f.write(f"@h{i}\n{seq[100:170]}\n+\n{'I' * 70}\n")
    with pytest.raises(MemoryError_, match="strict"):
        AlignWorkflow(WorkflowOptions(
            reference=str(tmp_path / "ref.fa"),
            output_dir=str(tmp_path / "out"),
            fastq1=str(tmp_path / "hot.fq"), batch_size=8,
            records_per_bin=4, memory_control="strict")).run()


def test_tiles_regex_filters(tmp_path):
    from isaac_aligner_tpu.io import bcl
    # reuse the options test's approach: 2 tiles, regex keeps one
    n, rl = 4, 40
    rng = np.random.default_rng(19)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
    (tmp_path / "ref.fa").write_text(f">cT\n{seq}\n")
    bases = np.stack([dna.encode(seq[100 + 50 * i : 100 + 50 * i + rl])
                      for i in range(n)])
    quals = np.full((n, rl), 30, np.uint8)
    info = bcl.RunInfo(
        flowcell="FCX", instrument="M0", run_number=7,
        reads=[bcl.ReadSegment(number=1, num_cycles=rl, is_indexed=False)],
        lane_count=1)
    for tile in (1101, 1205):
        bcl.write_run_folder(tmp_path / "run", info, lane=1, tile=tile,
                             segments=[(bases, quals)])
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"),
        output_dir=str(tmp_path / "out"),
        run_folder=str(tmp_path / "run"), tiles_regex="110[0-9]"))
    tiles = wf._bcl_tile_list()
    assert tiles == [(1, 1101)]
    with pytest.raises(InvalidOptionError, match="matched no tiles"):
        AlignWorkflow(WorkflowOptions(
            reference=str(tmp_path / "ref.fa"),
            output_dir=str(tmp_path / "out2"),
            run_folder=str(tmp_path / "run"),
            tiles_regex="9999"))._bcl_tile_list()


def test_realign_vigorously_smoke(wf_case):
    td, _ = wf_case
    out, wf = _run(td, "vig", realign_gaps="sample",
                   realign_vigorously=True)
    assert (out / "sorted.bam").exists()


def test_help_defaults_and_md(capsys):
    with pytest.raises(SystemExit) as e:
        cli_main(["align", "--help-defaults"])
    assert e.value.code == 0
    text = capsys.readouterr().out
    assert "--scatter-repeats\t0" in text
    with pytest.raises(SystemExit) as e:
        cli_main(["align", "--help-md"])
    assert e.value.code == 0
    assert "`--ignore-repeats`" in capsys.readouterr().out


def test_cli_accepts_new_flags(tmp_path, wf_case):
    td, _ = wf_case
    rc = cli_main([
        "align", "-r", str(td / "ref.fa"), "-1", str(td / "r1.fq"),
        "-o", str(tmp_path / "cliout"), "--batch-size", "8",
        "--scatter-repeats", "1", "--ignore-repeats", "1",
        "--ignore-neighbors", "1", "--avoid-smith-waterman", "1",
        "--realign-dodgy", "1", "--realign-vigorously", "1",
        "--cleanup-intermediary", "1", "--memory-control", "warning",
        "--allow-empty-flowcells", "1", "--lane-number-max", "4",
        "--bam-pu-format", "%F:%B", "--reference-name", "mini",
        "--description", "cli smoke", "--stats-image-format", "none",
        "--expected-bgzf-ratio", "0.4", "--buffer-bins", "0",
        "--pre-sort-bins", "0", "--base-calls-format", "fastq",
        "--clusters-at-a-time", "8"])
    assert rc == 0
    header, _, recs = read_bam(tmp_path / "cliout" / "sorted.bam")
    assert recs and "DS:cli smoke" in header
