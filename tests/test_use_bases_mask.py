"""use-bases-mask grammar tests (reference: UseBasesMaskGrammar.hh,
testUseBasesMaskGrammar.cpp)."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.io import bcl
from isaac_aligner_tpu.io.use_bases_mask import (effective_segments,
                                                 parse_entry,
                                                 parse_use_bases_mask)


def test_parse_entry_counts():
    assert parse_entry("y101", 101) == "y" * 101
    assert parse_entry("y100n", 101) == "y" * 100 + "n"
    assert parse_entry("i6nn", 8) == "i" * 6 + "nn"
    assert parse_entry("y*", 7) == "y" * 7
    assert parse_entry("y2n*y2", 8) == "yynnnnyy"
    assert parse_entry("Y3N*", 5) == "yyynn"  # case-insensitive


def test_parse_entry_errors():
    with pytest.raises(ValueError):
        parse_entry("y100", 101)         # undercovers
    with pytest.raises(ValueError):
        parse_entry("y102", 101)         # overcovers
    with pytest.raises(ValueError):
        parse_entry("y*n*", 8)           # two stars
    with pytest.raises(ValueError):
        parse_entry("x8", 8)             # bad flag
    with pytest.raises(ValueError):
        parse_entry("y8,", 8)            # trailing junk


def test_parse_full_mask():
    out = parse_use_bases_mask("y101,i8,y101", [101, 8, 101])
    assert [len(s) for s in out] == [101, 8, 101]
    with pytest.raises(ValueError):
        parse_use_bases_mask("y101,y101", [101, 8, 101])  # entry count


def _info(read_cycles, index_cycles=()):
    reads = []
    for i, c in enumerate(read_cycles):
        reads.append(bcl.ReadSegment(i + 1, c, False))
    for j, c in enumerate(index_cycles):
        reads.append(bcl.ReadSegment(len(read_cycles) + j + 1, c, True))
    return bcl.RunInfo(flowcell="F", instrument="I", run_number=1,
                       reads=reads, lane_count=1)


def test_effective_segments_default_mirrors_runinfo():
    info = _info([4, 4], [2])
    segs = effective_segments(info)
    assert segs == [(False, [0, 1, 2, 3]), (False, [4, 5, 6, 7]),
                    (True, [8, 9])]


def test_effective_segments_mask_overrides():
    info = _info([4, 4], [2])
    # trim last cycle of each data read, turn the index read into data
    segs = effective_segments(info, "y3n,n4,y2")
    assert segs == [(False, [0, 1, 2]), (False, [8, 9])]
    # a y-read converted to index
    segs2 = effective_segments(info, "i4,y4,n2")
    assert segs2 == [(True, [0, 1, 2, 3]), (False, [4, 5, 6, 7])]
    with pytest.raises(ValueError):
        effective_segments(info, "n4,n4,i2")  # no data cycles left


def test_load_tile_with_mask(tmp_path):
    reads = ["ACGTACGT", "TTTTCCCC"]
    bases = np.stack([dna.encode(r) for r in reads])
    quals = np.full(bases.shape, 30, np.uint8)
    info = _info([8])
    bcl.write_run_folder(tmp_path, info, lane=1, tile=1101,
                         segments=[(bases, quals)])
    # use only the first 6 cycles; masked cycles never hit the disk
    import shutil
    shutil.rmtree(tmp_path / "Data/Intensities/BaseCalls/L001/C7.1")
    shutil.rmtree(tmp_path / "Data/Intensities/BaseCalls/L001/C8.1")
    td = bcl.load_tile(tmp_path, 1, 1101, use_bases_mask="y6n2")
    got = ["".join("ACGTN"[c] for c in row) for row in td.read_bases[0]]
    assert got == ["ACGTAC", "TTTTCC"]


def test_load_tile_mask_makes_barcode(tmp_path):
    # single 12-cycle "read", masked as y8,i4 via one entry? No — entries
    # are per RunInfo read; use y8i4 within the one read.
    reads = ["ACGTACGTAACC", "TTTTCCCCGGTT"]
    bases = np.stack([dna.encode(r) for r in reads])
    quals = np.full(bases.shape, 30, np.uint8)
    info = _info([12])
    bcl.write_run_folder(tmp_path, info, lane=1, tile=1101,
                         segments=[(bases, quals)])
    td = bcl.load_tile(tmp_path, 1, 1101, use_bases_mask="y8i4")
    got = ["".join("ACGTN"[c] for c in row) for row in td.read_bases[0]]
    assert got == ["ACGTACGT", "TTTTCCCC"]
    bars = ["".join("ACGTN"[c] for c in row) for row in td.barcode_bases]
    assert bars == ["AACC", "GGTT"]
