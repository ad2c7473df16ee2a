"""BGZF + BAM writer/reader round-trips, .bai sanity, dedup semantics."""

import gzip
import struct

import numpy as np
import pytest

from isaac_aligner_tpu.build.dedup import coordinate_sort, mark_duplicates
from isaac_aligner_tpu.io import bgzf, sam
from isaac_aligner_tpu.io.bam import read_bam, reg2bin, write_bam
from isaac_aligner_tpu.io.fasta import genome_from_sequences


def test_bgzf_roundtrip_small():
    data = b"hello bgzf world" * 100
    stream, blocks = bgzf.compress(data)
    assert bgzf.decompress(stream) == data
    # members must also be plain-gzip readable
    assert gzip.decompress(stream) == data


def test_bgzf_roundtrip_multiblock():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    stream, blocks = bgzf.compress(data, threads=2)
    assert len(blocks) == -(-len(data) // bgzf.BLOCK_SIZE)
    assert bgzf.decompress(stream) == data
    # compressed lengths in `blocks` must tile the stream exactly
    assert sum(l for _o, l in blocks) == len(stream)


def test_bgzf_native_matches_python():
    from isaac_aligner_tpu.native import load_library
    lib = load_library("bgzf")
    assert lib is not None, "native bgzf failed to build"
    data = b"ACGT" * 50_000
    stream, _ = bgzf.compress(data)           # native path
    assert bgzf.decompress(stream) == data


def _mk_records():
    recs = [
        sam.SamRecord("r1", 0, "c1", 100, 60, "50M", seq="A" * 50, qual="I" * 50),
        sam.SamRecord("r2", 16, "c1", 200, 37, "20M5D30M", seq="C" * 50, qual="I" * 50),
        sam.SamRecord("r3", 0, "c2", 5, 0, "50M", seq="G" * 50, qual="#" * 50),
        sam.SamRecord("r4", 4, "*", 0, 0, "*", seq="T" * 50, qual="I" * 50),
    ]
    recs[0].set_tag("NM", "i", 0)
    recs[1].set_tag("NM", "i", 5)
    recs[1].set_tag("RG", "Z", "0")
    return recs


def test_bam_roundtrip(tmp_path):
    genome = genome_from_sequences([("c1", "A" * 1000), ("c2", "C" * 500)])
    recs = _mk_records()
    path = tmp_path / "out.bam"
    write_bam(path, recs, genome.contigs)
    text, refs, parsed = read_bam(path)
    assert refs == [("c1", 1000), ("c2", 500)]
    assert "@SQ" in text
    assert len(parsed) == len(recs)
    for orig, back in zip(recs, parsed):
        assert back.qname == orig.qname
        assert back.flag == orig.flag
        assert back.rname == orig.rname
        assert back.pos == orig.pos
        assert back.mapq == orig.mapq
        assert back.cigar == orig.cigar
        assert back.seq == orig.seq
        assert back.qual == orig.qual
        for t, v in orig.tags.items():
            assert back.tags[t] == v
    # companion files
    assert (tmp_path / "out.bam.bai").exists()
    assert (tmp_path / "out.bam.md5").exists()
    bai = (tmp_path / "out.bam.bai").read_bytes()
    assert bai[:4] == b"BAI\x01"
    assert struct.unpack("<i", bai[4:8])[0] == 2  # two references


def test_reg2bin_spec_values():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert reg2bin(0, (1 << 14) + 1) == 585


def test_coordinate_sort():
    genome = genome_from_sequences([("c1", "A" * 1000), ("c2", "C" * 500)])
    recs = _mk_records()
    shuffled = [recs[2], recs[3], recs[0], recs[1]]
    out = coordinate_sort(shuffled, genome.contigs)
    assert [r.qname for r in out] == ["r1", "r2", "r3", "r4"]


def test_mark_duplicates_pairs():
    def pair(name, p1, p2, qual="I"):
        a = sam.SamRecord(name, 0x1 | 0x40 | 0x20, "c1", p1, 60, "50M",
                          rnext="=", pnext=p2, seq="A" * 50, qual=qual * 50)
        b = sam.SamRecord(name, 0x1 | 0x80 | 0x10, "c1", p2, 60, "50M",
                          rnext="=", pnext=p1, seq="A" * 50, qual=qual * 50)
        return [a, b]

    recs = pair("p1", 100, 300) + pair("p2", 100, 300, qual="5") + \
        pair("p3", 100, 301)
    out = mark_duplicates(recs)
    dup_names = {r.qname for r in out if r.flag & sam.FLAG_DUPLICATE}
    assert dup_names == {"p2"}  # same anchors as p1, lower quality
    # removal mode
    out2 = mark_duplicates([sam.SamRecord.from_line(r.to_line()) for r in recs],
                           keep=False)
    assert {r.qname for r in out2} == {"p1", "p3"}


def test_mark_duplicates_unclipped_anchor():
    # soft-clipped start must dedup against the unclipped one
    a = sam.SamRecord("a", 0, "c1", 100, 60, "50M", seq="A" * 50, qual="I" * 50)
    b = sam.SamRecord("b", 0, "c1", 105, 60, "5S45M", seq="A" * 50, qual="5" * 50)
    out = mark_duplicates([a, b])
    assert not (out[0].flag & sam.FLAG_DUPLICATE)
    assert out[1].flag & sam.FLAG_DUPLICATE
