"""BCL run-folder data source tests (reference: rta::BclMapper,
io::FiltersMapper/LocsMapper/ClocsMapper, BclSeedSource)."""

import struct

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.io import bcl
from isaac_aligner_tpu.io.bam import read_bam


def _codes(s: str) -> np.ndarray:
    return dna.encode(s)


def _make_info(read_cycles=(8,), index_cycles=(), lane_count=1):
    reads = []
    n = 1
    for c in read_cycles:
        reads.append(bcl.ReadSegment(number=n, num_cycles=c, is_indexed=False))
        n += 1
    for c in index_cycles:
        reads.append(bcl.ReadSegment(number=n, num_cycles=c, is_indexed=True))
        n += 1
    return bcl.RunInfo(flowcell="FCX", instrument="M001", run_number=7,
                       reads=reads, lane_count=lane_count)


def test_run_info_roundtrip(tmp_path):
    info = _make_info(read_cycles=(101, 101), index_cycles=(8,))
    bcl.write_run_info(tmp_path, info)
    back = bcl.parse_run_info(tmp_path)
    assert back.flowcell == "FCX"
    assert back.instrument == "M001"
    assert back.run_number == 7
    assert back.total_cycles == 210
    assert [r.num_cycles for r in back.data_reads] == [101, 101]
    assert [r.num_cycles for r in back.index_reads] == [8]
    # cycle ranges are contiguous 1-based
    ranges = back.cycle_ranges()
    assert ranges[0][1:] == (1, 101)
    assert ranges[1][1:] == (102, 202)
    assert ranges[2][1:] == (203, 210)


def test_bcl_codec_roundtrip(tmp_path):
    bases = np.array([0, 1, 2, 3, 4, 2], np.uint8)  # incl. an N
    quals = np.array([30, 2, 40, 25, 0, 35], np.uint8)
    f = tmp_path / "c.bcl"
    bcl.write_bcl(f, bases, quals)
    b, q = bcl.read_bcl(f)
    assert b.tolist() == [0, 1, 2, 3, 4, 2]
    # the N slot decodes as qual 0
    assert q.tolist() == [30, 2, 40, 25, 0, 35]
    # gzip variant
    fz = tmp_path / "c.bcl.gz"
    bcl.write_bcl(fz, bases, quals)
    b2, q2 = bcl.read_bcl(fz)
    np.testing.assert_array_equal(b, b2)
    np.testing.assert_array_equal(q, q2)


def test_filter_roundtrip(tmp_path):
    pf = np.array([True, False, True, True, False])
    f = tmp_path / "s_1_1101.filter"
    bcl.write_filter(f, pf)
    np.testing.assert_array_equal(bcl.read_filter(f), pf)


def test_locs_roundtrip(tmp_path):
    x = np.array([0.0, 15.5, 102.3], np.float32)
    y = np.array([3.0, 0.0, 99.9], np.float32)
    f = tmp_path / "s_1_1101.locs"
    bcl.write_locs(f, x, y)
    xi, yi = bcl.read_locs(f)
    # CASAVA convention round(10x + 1000)
    assert xi.tolist() == [1000, 1155, 2023]
    assert yi.tolist() == [1030, 1000, 1999]


def test_clocs_decode(tmp_path):
    # hand-build a clocs: version 1, 84 bins; bin 0 has 2 clusters,
    # bin 83 (row 1, col 1) has 1 cluster
    payload = bytearray()
    payload += bytes([1])
    payload += struct.pack("<I", 84)
    for b in range(84):
        if b == 0:
            payload += bytes([2, 10, 20, 250, 0])
        elif b == 83:
            payload += bytes([1, 5, 15])
        else:
            payload += bytes([0])
    f = tmp_path / "s_1_1101.clocs"
    f.write_bytes(bytes(payload))
    x, y = bcl.read_clocs(f)
    assert len(x) == 3
    # bin 0: x=dx/10, y=dy/10
    assert x[0] == 1010 and y[0] == 1020   # (1.0, 2.0)
    assert x[1] == 1250 and y[1] == 1000   # (25.0, 0.0)
    # bin 83 = row 1 col 1: origin (25, 25)
    assert x[2] == 1255 and y[2] == 1265   # (25.5, 26.5)


def _write_tile(tmp_path, reads, quals=None, index_seqs=None, pf=None,
                compress=False, lane=1, tile=1101):
    n = len(reads)
    rl = len(reads[0])
    bases = np.stack([_codes(r) for r in reads])
    if quals is None:
        quals = np.full((n, rl), 30, np.uint8)
    segs = [(bases, quals)]
    index_cycles = ()
    if index_seqs is not None:
        il = len(index_seqs[0])
        ib = np.stack([_codes(s) for s in index_seqs])
        segs.append((ib, np.full((n, il), 30, np.uint8)))
        index_cycles = (il,)
    info = _make_info(read_cycles=(rl,), index_cycles=index_cycles)
    bcl.write_run_folder(tmp_path, info, lane=lane, tile=tile, segments=segs,
                         pf=pf, compress=compress)
    return info


def test_tile_roundtrip(tmp_path):
    reads = ["ACGTACGT", "TTTTACGN", "GGGGCCCC"]
    info = _write_tile(tmp_path, reads)
    assert bcl.discover_lanes(tmp_path) == [1]
    assert bcl.discover_tiles(tmp_path, 1) == [1101]
    td = bcl.load_tile(tmp_path, 1, 1101)
    assert td.cluster_count == 3
    got = ["".join("ACGTN"[c] for c in row) for row in td.read_bases[0]]
    assert got == reads
    batches, bar = bcl.tile_read_batches(td, info)
    assert batches[0].count == 3
    assert bar.shape == (3, 0)
    # N base carries qual 0 in the batch
    assert batches[0].quals[1, 7] == 0
    assert batches[0].names[0] == "M001:7:FCX:1:1101:1000:1000"


def test_pass_filter_and_barcodes(tmp_path):
    reads = ["ACGTACGT", "CCCCCCCC", "GGGGGGGG", "TTTTTTTT"]
    pf = np.array([True, False, True, False])
    info = _write_tile(tmp_path, reads, pf=pf,
                       index_seqs=["AACC", "GGTT", "ACAC", "TGTG"],
                       compress=True)
    td = bcl.load_tile(tmp_path, 1, 1101)
    batches, bar = bcl.tile_read_batches(td, info, pf_only=True)
    assert batches[0].count == 2
    got = ["".join("ACGTN"[c] for c in row) for row in batches[0].bases]
    assert got == ["ACGTACGT", "GGGGGGGG"]
    got_bar = ["".join("ACGTN"[c] for c in row) for row in bar]
    assert got_bar == ["AACC", "ACAC"]


def test_load_run_reads_paired(tmp_path):
    r1 = ["ACGTACGT", "TTTTAAAA"]
    r2 = ["CCCCGGGG", "ACACACAC"]
    b1 = np.stack([_codes(r) for r in r1])
    b2 = np.stack([_codes(r) for r in r2])
    q = np.full((2, 8), 30, np.uint8)
    info = _make_info(read_cycles=(8, 8))
    bcl.write_run_folder(tmp_path, info, lane=1, tile=1101,
                         segments=[(b1, q), (b2, q)])
    rb1, rb2, bar = bcl.load_run_reads(tmp_path)
    assert rb2 is not None
    assert rb1.names == rb2.names  # pairs share names
    got1 = ["".join("ACGTN"[c] for c in row) for row in rb1.bases]
    got2 = ["".join("ACGTN"[c] for c in row) for row in rb2.bases]
    assert got1 == r1 and got2 == r2


def test_missing_cycle_raises(tmp_path):
    _write_tile(tmp_path, ["ACGTACGT"])
    # delete one cycle dir
    import shutil
    shutil.rmtree(tmp_path / "Data/Intensities/BaseCalls/L001/C5.1")
    with pytest.raises(FileNotFoundError):
        bcl.load_tile(tmp_path, 1, 1101)


def test_workflow_from_run_folder(tmp_path):
    """e2e: synthetic run folder -> AlignWorkflow -> sorted BAM."""
    from isaac_aligner_tpu.io.fasta import genome_from_sequences
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))
    fa = tmp_path / "ref.fa"
    fa.write_text(f">chrT\n{seq}\n")

    read_len = 64
    starts = [100, 700, 1500, 2200]
    reads = [seq[s:s + read_len] for s in starts]
    info = _write_tile(tmp_path / "run", reads)

    out = tmp_path / "out"
    wf = AlignWorkflow(WorkflowOptions(
        reference=str(fa), output_dir=str(out),
        run_folder=str(tmp_path / "run"), batch_size=16,
        realign_gaps="no"))
    wf.run()
    assert (out / "sorted.bam").exists()

    from isaac_aligner_tpu.io import sam
    records = read_bam(out / "sorted.bam")[2]
    mapped = [r for r in records if not (r.flag & sam.FLAG_UNMAPPED)]
    assert len(mapped) == 4
    assert sorted(r.pos for r in mapped) == [s + 1 for s in starts]


def test_bgzf_aggregated_layout(tmp_path):
    """NextSeq layout: per-cycle bgzf files + bci index (BclBgzfSeedSource)."""
    info = _make_info(read_cycles=(8,))
    q = np.full((2, 8), 30, np.uint8)
    q3 = np.full((3, 8), 30, np.uint8)
    t1_reads = ["ACGTACGT", "TTTTCCCC"]
    t2_reads = ["GGGGAAAA", "CACACACA", "TGTGTGTG"]
    t1 = np.stack([_codes(r) for r in t1_reads])
    t2 = np.stack([_codes(r) for r in t2_reads])
    bcl.write_run_folder_bgzf(tmp_path, info, lane=1,
                              tiles=[(1101, [(t1, q)]), (1102, [(t2, q3)])])
    assert bcl.discover_tiles(tmp_path, 1) == [1101, 1102]
    td1 = bcl.load_tile(tmp_path, 1, 1101)
    td2 = bcl.load_tile(tmp_path, 1, 1102)
    got1 = ["".join("ACGTN"[c] for c in row) for row in td1.read_bases[0]]
    got2 = ["".join("ACGTN"[c] for c in row) for row in td2.read_bases[0]]
    assert got1 == t1_reads
    assert got2 == t2_reads
    assert td1.pf.all() and td2.pf.all()
    # whole-run loader concatenates both tiles
    b1, b2, _bar = bcl.load_run_reads(tmp_path)
    assert b2 is None
    assert b1.count == 5


def test_per_tile_stats_from_run_folder(tmp_path):
    """MatchSelectorStats carries a per-(lane, tile) breakdown for BCL."""
    import xml.etree.ElementTree as ET

    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(13)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    fa = tmp_path / "ref.fa"
    fa.write_text(f">c\n{seq}\n")
    info = _make_info(read_cycles=(64,))
    q = np.full((2, 64), 30, np.uint8)
    for tile, starts in ((1101, (100, 900)), (1102, (1500, 2200))):
        reads = np.stack([_codes(seq[s:s + 64]) for s in starts])
        bcl.write_run_folder(tmp_path / "run", info, lane=1, tile=tile,
                             segments=[(reads, q)])
    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(fa), output_dir=str(out),
        run_folder=str(tmp_path / "run"), batch_size=8,
        realign_gaps="no")).run()
    root = ET.parse(out / "Stats" / "MatchSelectorStats.xml").getroot()
    tiles = {(t.get("lane"), t.get("number")): t.findtext("Aligned")
             for t in root.findall(".//Tile") if t.get("lane")}
    assert tiles == {("1", "1101"): "2", ("1", "1102"): "2"}


def test_bcl_demux_to_per_sample_bams(tmp_path):
    """Paired BCL run with index read -> BarcodeResolver -> per-sample
    sorted BAMs (reference FindMatchesTransition barcode path +
    BarcodeBamMapping)."""
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(17)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 8000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    (tmp_path / "samples.csv").write_text(
        "barcode,sample\nACACACAC,sampleA\nTGTGTGTG,sampleB\n")

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    starts = [500, 2000, 4000, 6000]
    barcodes = ["ACACACAC", "TGTGTGTG", "ACACACAC", "GGGGGGGG"]  # last unknown
    r1 = [seq[s:s + 64] for s in starts]
    r2 = ["".join(comp[b] for b in reversed(seq[s + 236:s + 300]))
          for s in starts]
    q = np.full((4, 64), 30, np.uint8)
    qi = np.full((4, 8), 30, np.uint8)
    info = _make_info(read_cycles=(64, 64), index_cycles=(8,))
    bcl.write_run_folder(
        tmp_path / "run", info, lane=1, tile=1101,
        segments=[(np.stack([_codes(r) for r in r1]), q),
                  (np.stack([_codes(r) for r in r2]), q),
                  (np.stack([_codes(b) for b in barcodes]), qi)])

    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "ref.fa"), output_dir=str(out),
        run_folder=str(tmp_path / "run"), batch_size=8,
        sample_sheet=str(tmp_path / "samples.csv"),
        realign_gaps="no")).run()

    from isaac_aligner_tpu.io.bam import read_bam
    a = read_bam(out / "sampleA" / "sorted.bam")[2]
    b = read_bam(out / "sampleB" / "sorted.bam")[2]
    assert len(a) == 4   # 2 pairs
    assert len(b) == 2   # 1 pair
    # the unknown-barcode pair lands in the unknown-sample output
    unknown_dirs = [d.name for d in out.iterdir() if d.is_dir()
                    and d.name not in ("sampleA", "sampleB", "Temp", "Stats")]
    assert unknown_dirs, "unknown barcode output missing"
    import xml.etree.ElementTree as ET
    root = ET.parse(out / "Stats" / "DemultiplexingStats.xml").getroot()
    counts = {e.get("name"): int(e.findtext("ClusterCount"))
              for e in root.findall(".//Barcode")}
    assert counts["sampleA"] == 2 and counts["sampleB"] == 1


def test_bcl_tags_bc_zx_zy(tmp_path):
    """BC carries the barcode sequence; ZX/ZY (cluster coordinates) are
    excluded by default and appear with --bam-exclude-tags none
    (reference FragmentAccessorBamAdapter + manual.md:241-275)."""
    from isaac_aligner_tpu.io.bam import read_bam
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    rng = np.random.default_rng(23)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    (tmp_path / "ref.fa").write_text(f">c\n{seq}\n")
    (tmp_path / "samples.csv").write_text("barcode,sample\nACACACAC,sampleA\n")
    reads = [seq[100:164], seq[2000:2064]]
    q = np.full((2, 64), 30, np.uint8)
    qi = np.full((2, 8), 30, np.uint8)
    info = _make_info(read_cycles=(64,), index_cycles=(8,))
    bcl.write_run_folder(
        tmp_path / "run", info, lane=1, tile=1101,
        segments=[(np.stack([_codes(r) for r in reads]), q),
                  (np.stack([_codes("ACACACAC")] * 2), qi)])

    for name, excl, want_zx in (("out_dflt", "ZX,ZY", False),
                                ("out_all", "none", True)):
        out = tmp_path / name
        AlignWorkflow(WorkflowOptions(
            reference=str(tmp_path / "ref.fa"), output_dir=str(out),
            run_folder=str(tmp_path / "run"), batch_size=8,
            sample_sheet=str(tmp_path / "samples.csv"),
            bam_exclude_tags=excl, realign_gaps="no")).run()
        recs = read_bam(out / "sampleA" / "sorted.bam")[2]
        assert len(recs) == 2
        for r in recs:
            assert r.tags["BC"] == ("Z", "ACACACAC")
            assert r.tags["RG"] == ("Z", "sampleA")
            assert ("ZX" in r.tags) == want_zx
            assert ("ZY" in r.tags) == want_zx
            if want_zx:
                # names are <inst>:<run>:<fc>:<lane>:<tile>:<x>:<y>
                x, y = r.qname.split(":")[-2:]
                assert r.tags["ZX"] == ("i", int(x))
                assert r.tags["ZY"] == ("i", int(y))
