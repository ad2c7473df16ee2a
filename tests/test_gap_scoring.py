"""GapScoring presets / --tls override tests (reference
AlignOptions.cpp:409,693 gap-scoring grammar; manual.md:572 --tls)."""

import pytest

from isaac_aligner_tpu.align.gapped import BWA, ELAND, GapScoring
from isaac_aligner_tpu.io.bam import read_bam
from isaac_aligner_tpu.workflow.align import parse_tls_override


def test_presets():
    assert GapScoring.parse("bwa") is BWA
    assert GapScoring.parse("eland") is ELAND
    # bwa 0:-3:-11:-4:-20 -> normalized 3/11/4/20 (AlignerBase.cpp:38-41)
    assert (BWA.norm_mismatch, BWA.norm_open, BWA.norm_extend,
            BWA.norm_max_extend) == (3, 11, 4, 20)
    # eland 2:-1:-15:-3:-25 -> normalized 3/17/5/25
    assert (ELAND.norm_mismatch, ELAND.norm_open, ELAND.norm_extend,
            ELAND.norm_max_extend) == (3, 17, 5, 25)


def test_parse_colon_string():
    gs = GapScoring.parse("1:-2:-10:-3:-15")
    assert gs.sw_scores() == (1.0, -2.0, -10.0, -3.0)
    assert gs.norm_max_extend == 15
    # 4-part form defaults min_extend to -20
    assert GapScoring.parse("0:-3:-11:-4").norm_max_extend == 20
    with pytest.raises(ValueError):
        GapScoring.parse("0:-3")
    with pytest.raises(ValueError):
        GapScoring.parse("nope")


def test_tls_override_parse():
    t = parse_tls_override("100:300:500:50:50:1:6")
    assert (t.min, t.max) == (100, 500)
    assert (t.mate_min, t.mate_max) == (100, 500)
    assert (t.best0, t.best1) == (1, 6)
    with pytest.raises(ValueError):
        parse_tls_override("100:300:500")
    with pytest.raises(ValueError):
        parse_tls_override("100:300:500:50:50:9:6")


def test_workflow_tls_override(tmp_path):
    """Paired workflow with --tls skips learning and uses the given model."""
    import numpy as np
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    r1s, r2s = [], []
    for s in (500, 1500, 2500, 3500):
        r1s.append(seq[s:s + 64])
        frag_end = s + 300
        mate = seq[frag_end - 64:frag_end]
        r2s.append("".join(comp[b] for b in reversed(mate)))
    q = "I" * 64
    (tmp_path / "r1.fq").write_text(
        "".join(f"@p{i}\n{r}\n+\n{q}\n" for i, r in enumerate(r1s)))
    (tmp_path / "r2.fq").write_text(
        "".join(f"@p{i}\n{r}\n+\n{q}\n" for i, r in enumerate(r2s)))
    out = tmp_path / "out"
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
        batch_size=8, realign_gaps="no",
        tls_override="200:300:400:30:30:1:6"))
    wf.run()
    assert wf._stats["tls"]["min"] == 200
    from isaac_aligner_tpu.io import sam
    recs = read_bam(out / "sorted.bam")[2]
    proper = [r for r in recs if r.flag & sam.FLAG_PROPER_PAIR]
    assert len(proper) == 8  # all 4 pairs proper under the forced model


def test_seeds_and_dodgy_flags(tmp_path):
    """--seeds explicit offsets + --dodgy-alignment-score Unaligned."""
    import numpy as np
    from isaac_aligner_tpu.io import sam
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(21)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, 64))
    # genome with the same 64bp unit repeated 30 times + unique flank
    flank = "".join("ACGT"[i] for i in rng.integers(0, 4, 2000))
    seq = core * 30 + flank
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    # a repeat read (30 placements > scored capacity) and a unique read
    (tmp_path / "r.fq").write_text(
        f"@rep\n{core}\n+\n{'I' * 64}\n"
        f"@uni\n{flank[100:164]}\n+\n{'I' * 64}\n")

    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "r.fq"), batch_size=8, realign_gaps="no",
        seeds="0:32", dodgy_alignment_score="Unaligned")).run()
    recs = read_bam(out / "sorted.bam")[2]
    by_name = {r.qname: r for r in recs}
    # the repeat read is dodgy -> marked unaligned under "Unaligned"
    assert by_name["rep"].flag & sam.FLAG_UNMAPPED
    assert not (by_name["uni"].flag & sam.FLAG_UNMAPPED)
    assert by_name["uni"].pos == 64 * 30 + 101


def test_paired_dodgy_repeat_mapq_zero(tmp_path):
    """Paired path must apply dodgy handling too: a pair whose end has
    more placements than the scored-candidate cap gets MAPQ 0."""
    import numpy as np
    from isaac_aligner_tpu.io import sam
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(47)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, 64))
    flank = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    seq = core * 30 + flank
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    # R1 = the repeat unit, R2 = unique flank revcomped (a real-ish pair)
    mate = flank[100:164]
    (tmp_path / "r1.fq").write_text(f"@rep\n{core}\n+\n{'I' * 64}\n")
    (tmp_path / "r2.fq").write_text(
        f"@rep\n{''.join(comp[b] for b in reversed(mate))}\n+\n{'I' * 64}\n")
    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
        batch_size=8, realign_gaps="no", seeds="0:32",
        tls_override="100:300:2200:50:50:1:6")).run()
    recs = read_bam(out / "sorted.bam")[2]
    r1 = next(r for r in recs if r.flag & sam.FLAG_READ1)
    assert r1.is_mapped
    assert r1.mapq == 0, f"repeat end must be dodgy, got MAPQ {r1.mapq}"


def test_mq_tag_matches_mate_mapq(tmp_path):
    """MQ must equal the MAPQ written on the mate's own record."""
    import numpy as np
    from isaac_aligner_tpu.io import sam
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(49)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    r1 = seq[500:564]
    mate = seq[736:800]
    (tmp_path / "r1.fq").write_text(f"@p\n{r1}\n+\n{'I' * 64}\n")
    (tmp_path / "r2.fq").write_text(
        f"@p\n{''.join(comp[b] for b in reversed(mate))}\n+\n{'I' * 64}\n")
    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "r1.fq"), fastq2=str(tmp_path / "r2.fq"),
        batch_size=8, realign_gaps="no",
        tls_override="200:300:400:30:30:1:6")).run()
    recs = read_bam(out / "sorted.bam")[2]
    by_end = {1 if r.flag & sam.FLAG_READ1 else 2: r for r in recs}
    assert by_end[1].tags["MQ"][1] == by_end[2].mapq
    assert by_end[2].tags["MQ"][1] == by_end[1].mapq
    assert by_end[1].tags["MC"][1] == by_end[2].cigar
