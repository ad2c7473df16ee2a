"""Gap realigner tests (reference: build/cppunit/testGapRealigner.cpp)."""

import numpy as np

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.build.realign import (Gap, collect_gaps,
                                             realign_records)
from isaac_aligner_tpu.io import sam
from isaac_aligner_tpu.io.fasta import genome_from_sequences


def _mk_genome(n=400, seed=7):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    return genome_from_sequences([("chr1", seq)]), seq


def _rec(name, pos, cigar, seq, flag=0, rname="chr1", mapq=50):
    return sam.SamRecord(qname=name, flag=flag, rname=rname, pos=pos,
                         mapq=mapq, cigar=cigar, seq=seq,
                         qual="I" * len(seq))


def test_collect_gaps():
    recs = [
        _rec("a", 11, "20M5D30M", "A" * 50),
        _rec("b", 31, "10M2I38M", "A" * 50),
        _rec("c", 1, "50M", "A" * 50),
    ]
    gaps = collect_gaps(recs)["chr1"]
    assert Gap("chr1", 30, 5, False) in gaps      # deletion after 20M from pos 10
    assert Gap("chr1", 40, 2, True) in gaps       # insertion after 10M from pos 30
    assert len(gaps) == 2


def test_realign_deletion():
    genome, seq = _mk_genome()
    p = 100
    # true sample has a 5-base deletion at ref p+20
    read = seq[p : p + 20] + seq[p + 25 : p + 55]      # 50 bases
    donor = _rec("donor", p + 1, "20M5D30M", read)
    victim = _rec("victim", p + 1, "50M", read)        # aligned ungapped
    recs = [donor, victim]
    changed = realign_records(recs, genome)
    assert changed == 1
    assert victim.cigar == "20M5D30M"
    assert victim.tags["OC"] == ("Z", "50M")
    assert victim.tags["NM"] == ("i", 5)
    assert victim.pos == p + 1
    # donor untouched (already the best choice)
    assert donor.cigar == "20M5D30M"
    assert "OC" not in donor.tags


def test_realign_insertion():
    genome, seq = _mk_genome()
    p = 50
    ins = "ACGTA"
    read = seq[p : p + 20] + ins + seq[p + 20 : p + 45]    # 50 bases
    donor = _rec("donor", p + 1, "20M5I25M", read)
    victim = _rec("victim", p + 1, "50M", read)
    changed = realign_records([donor, victim], genome)
    assert changed == 1
    assert victim.cigar == "20M5I25M"
    assert victim.tags["NM"] == ("i", 5)


def test_realign_respects_soft_clips():
    genome, seq = _mk_genome()
    p = 100
    read = "TTTT" + seq[p : p + 16] + seq[p + 21 : p + 51]
    victim = _rec("victim", p + 1, "4S46M", read)
    donor_read = seq[p : p + 16] + seq[p + 21 : p + 51]
    donor = _rec("donor", p + 1, "16M5D30M", donor_read)
    changed = realign_records([donor, victim], genome)
    assert changed == 1
    assert victim.cigar == "4S16M5D30M"


def test_no_realign_without_improvement():
    genome, seq = _mk_genome()
    p = 100
    exact = seq[p : p + 50]
    donor = _rec("donor", p + 201, "20M5D30M",
                 seq[p + 200 : p + 220] + seq[p + 225 : p + 255])
    good = _rec("good", p + 1, "50M", exact)
    changed = realign_records([donor, good], genome)
    assert changed == 0
    assert good.cigar == "50M"
    assert "OC" not in good.tags


def test_realign_two_gaps_combination():
    genome, seq = _mk_genome()
    p = 120
    # sample carries two deletions: 3 bases at p+15 and 4 bases at p+35
    read = seq[p : p + 15] + seq[p + 18 : p + 38] + seq[p + 42 : p + 62]
    assert len(read) == 55
    d1 = _rec("d1", p + 1, "15M3D40M", read)       # knows only gap 1 shape
    d2 = _rec("d2", p + 1, "38M4D17M", "N" * 55)   # donates gap 2 position
    victim = _rec("victim", p + 1, "55M", read)
    realign_records([d1, d2, victim], genome)
    assert victim.cigar == "15M3D20M4D20M"
    assert victim.tags["NM"] == ("i", 7)


def test_mate_patching_after_realign():
    genome, seq = _mk_genome()
    p = 60
    read1 = seq[p : p + 20] + seq[p + 25 : p + 55]
    f1 = sam.FLAG_PAIRED | sam.FLAG_READ1
    f2 = sam.FLAG_PAIRED | sam.FLAG_READ2 | sam.FLAG_REVERSE
    r1 = _rec("pairA", p + 1, "50M", read1, flag=f1)
    r2 = _rec("pairA", p + 151, "50M", seq[p + 150 : p + 200], flag=f2)
    r1.pnext, r2.pnext = r2.pos, r1.pos
    r1.tlen, r2.tlen = 200, -200
    donor = _rec("donor", p + 1, "20M5D30M", read1)
    realign_records([donor, r1, r2], genome)
    assert r1.cigar == "20M5D30M"
    # TLEN recomputed from the realigned extents
    span = (r2.pos - 1 + 50) - (r1.pos - 1)
    assert r1.tlen == span
    assert r2.tlen == -span
