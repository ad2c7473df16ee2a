"""Stats XML + HTML report tests (reference: MatchSelectorStatsXml.cpp,
BuildStatsXml.cpp, AlignmentReportGenerator.cpp)."""

import xml.etree.ElementTree as ET

from isaac_aligner_tpu.workflow import reports


def test_match_selector_stats_xml(tmp_path):
    stats = {"total_reads": 100, "aligned": 95, "perfect": 60,
             "proper_pairs": 40, "mapq_hist": [0] * 60 + [95]}
    f = tmp_path / "MatchSelectorStats.xml"
    reports.write_match_selector_stats_xml(stats, f, sample="s1")
    root = ET.parse(f).getroot()
    frag = root.find(".//AllFragments")
    assert frag.findtext("Count") == "100"
    assert frag.findtext("Aligned") == "95"
    assert frag.findtext("PercentAligned") == "95.00"
    mapqs = frag.findall(".//Mapq")
    assert len(mapqs) == 1 and mapqs[0].get("value") == "60"
    assert root.find(".//Sample").get("name") == "s1"


def test_demultiplexing_stats_xml(tmp_path):
    f = tmp_path / "DemultiplexingStats.xml"
    reports.write_demultiplexing_stats_xml({"sA": 10, "unknown": 3}, f)
    root = ET.parse(f).getroot()
    got = {b.get("name"): b.findtext("ClusterCount")
           for b in root.findall(".//Barcode")}
    assert got == {"sA": "10", "unknown": "3"}


def test_build_stats_xml(tmp_path):
    f = tmp_path / "BuildStats.xml"
    reports.write_build_stats_xml(
        {"records": 50, "duplicates": 5, "realigned": 2}, f)
    root = ET.parse(f).getroot()
    b = root.find("Bin")
    assert b.findtext("Total") == "50"
    assert b.findtext("Unique") == "45"
    assert b.findtext("Duplicates") == "5"
    assert b.findtext("Realigned") == "2"


def test_html_report(tmp_path):
    f = tmp_path / "AlignmentReport.html"
    reports.write_html_report({
        "match_selector": {"total_reads": 10, "aligned": 9,
                           "mapq_hist": [0] * 60 + [9]},
        "build": {"records": 9, "duplicates": 1},
        "demultiplexing": {"sA": 9},
        "tls": {"median": 300},
    }, f)
    html = f.read_text()
    assert "<svg" in html           # the inline MAPQ plot
    assert "90.00%" in html
    assert "Demultiplexing" in html
    assert "Template length" in html


def test_workflow_emits_xml(tmp_path):
    import numpy as np
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(2)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    fa = tmp_path / "ref.fa"
    fa.write_text(f">c\n{seq}\n")
    fq = tmp_path / "r.fq"
    read = seq[100:164]
    fq.write_text(f"@r0\n{read}\n+\n{'I' * 64}\n")
    out = tmp_path / "out"
    wf = AlignWorkflow(WorkflowOptions(reference=str(fa), output_dir=str(out),
                                       fastq1=str(fq), batch_size=8,
                                       realign_gaps="no"))
    wf.run()
    for name in ("MatchSelectorStats.xml", "BuildStats.xml",
                 "AlignmentReport.html"):
        assert (out / "Stats" / name).exists(), name
    root = ET.parse(out / "Stats" / "MatchSelectorStats.xml").getroot()
    assert root.find(".//AllFragments").findtext("Aligned") == "1"


def test_match_finder_stats_xml(tmp_path):
    f = tmp_path / "MatchFinderStats.xml"
    reports.write_match_finder_stats_xml(
        {"seeds_no_match": 7, "seeds_too_many": 2, "pass2_reads": 3}, f)
    root = ET.parse(f).getroot()
    t = root.find("Tile")
    assert t.findtext("SeedsNoMatch") == "7"
    assert t.findtext("SeedsTooMany") == "2"
    assert t.findtext("Pass2Reads") == "3"


def test_workflow_emits_match_finder_stats(tmp_path):
    import numpy as np
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    # one aligning read + one garbage read (all seeds miss)
    good = seq[100:164]
    bad = "".join("ACGT"[(i * 7 + 3) % 4] for i in range(64))
    (tmp_path / "r.fq").write_text(
        f"@g\n{good}\n+\n{'I' * 64}\n@b\n{bad}\n+\n{'I' * 64}\n")
    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        fastq1=str(tmp_path / "r.fq"), batch_size=8,
        realign_gaps="no")).run()
    assert (out / "Stats" / "MatchFinderStats.xml").exists()
    root = ET.parse(out / "Stats" / "MatchFinderStats.xml").getroot()
    assert int(root.find("Tile").findtext("SeedsNoMatch")) > 0


def test_per_tile_grid_in_html(tmp_path):
    """Multi-tile runs get a per-tile mini-plot grid (reference: the
    per-tile gnuplot image set, AlignmentReportGenerator.cpp:65-154)."""
    from isaac_aligner_tpu.workflow import reports
    tiles = []
    for lane in ("1", "2"):
        for tile in ("0001", "0002", "0003"):
            tiles.append({"lane": lane, "tile": tile, "barcode": "s1",
                          "read": 1, "total": 100, "aligned": 93,
                          "perfect": 60, "yield": 10_000,
                          "yield_q30": 9_000, "mapq_sum": 5_100})
    f = tmp_path / "r.html"
    reports.write_html_report(
        {"match_selector": {"total_reads": 600, "aligned": 558,
                            "mapq_hist": [0] * 59 + [1, 557],
                            "tiles": tiles}}, f)
    html = f.read_text()
    assert "Per-tile plots" in html
    assert html.count("L1 T") == 3 and html.count("L2 T") == 3
    assert "tile 0002 aligned: 93.0%" in html
