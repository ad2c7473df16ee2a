"""End-to-end paired-end alignment (config 2 of the BASELINE ladder:
PE + TLS + shadow rescue)."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.aligner import PairedAligner
from isaac_aligner_tpu.align.pairs import TlsStatic
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io import sam
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import batch_from_reads

READ_LEN = 64
GENOME_LEN = 20000


@pytest.fixture(scope="module")
def ref():
    rng = np.random.default_rng(21)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, GENOME_LEN))
    genome = genome_from_sequences([("chrP", seq)])
    index = build_index(genome, seed_len=32)
    return genome, seq, index


def _make_pairs(seq, rng, n, tlen_mean=300, tlen_sd=20, mutate_r1=None):
    """Standard FRp pairs: r1 fwd at p, r2 = revcomp of the fragment end."""
    names, r1s, r2s, infos = [], [], [], []
    for i in range(n):
        p = int(rng.integers(0, GENOME_LEN - 1000))
        tlen = int(np.clip(rng.normal(tlen_mean, tlen_sd), 150, 900))
        frag = seq[p : p + tlen]
        r1 = frag[:READ_LEN]
        r2 = dna.decode(dna.revcomp(dna.encode(frag[-READ_LEN:])))
        if mutate_r1 and i in mutate_r1:
            r1 = mutate_r1[i](r1)
        names.append(f"p{i}")
        r1s.append(r1)
        r2s.append(r2)
        infos.append((p, tlen))
    b1 = batch_from_reads(names, r1s)
    b2 = batch_from_reads(names, r2s)
    return b1, b2, infos


@pytest.fixture(scope="module")
def trained_aligner(ref):
    genome, seq, index = ref
    rng = np.random.default_rng(1)
    aligner = PairedAligner.create(index, read_len=READ_LEN)
    b1, b2, _ = _make_pairs(seq, rng, 512)
    aligner.learn_tls([(b1, b2)])
    return aligner


def test_learned_tls_sensible(trained_aligner):
    t = trained_aligner.tls
    assert t.best0 in (1, 6)  # FRp or RFm
    assert 150 <= t.min <= 300
    assert 300 <= t.max <= 500


def test_proper_pairs(ref, trained_aligner):
    genome, seq, index = ref
    rng = np.random.default_rng(7)
    b1, b2, infos = _make_pairs(seq, rng, 16)
    recs = trained_aligner.align_to_sam(b1, b2)
    assert len(recs) == 32
    by_name = {}
    for r in recs:
        by_name.setdefault(r.qname, []).append(r)
    for i, (p, tlen) in enumerate(infos):
        r1, r2 = by_name[f"p{i}"]
        assert r1.flag & sam.FLAG_PAIRED and r1.flag & sam.FLAG_READ1
        assert r2.flag & sam.FLAG_READ2
        assert r1.flag & sam.FLAG_PROPER_PAIR, (i, r1)
        assert r1.pos == p + 1
        assert r2.pos == p + tlen - READ_LEN + 1
        assert not (r1.flag & sam.FLAG_REVERSE)
        assert r1.flag & sam.FLAG_MATE_REVERSE
        assert r2.flag & sam.FLAG_REVERSE
        assert r1.tlen == tlen
        assert r2.tlen == -tlen
        assert r1.rnext == "="
        assert r1.pnext == r2.pos
        assert r1.mapq >= 40


def test_shadow_rescue(ref, trained_aligner):
    genome, seq, index = ref
    rng = np.random.default_rng(9)
    # mutate r1 heavily so its seeds all miss -> end 1 becomes a shadow;
    # rescue must recover it from the TLS window around r2
    def scramble(r):
        # 1 mismatch every 10 bases kills both 32-mers but stays well under
        # the rescue mismatch cap (25%)
        out = list(r)
        for j in range(4, READ_LEN, 10):
            out[j] = "A" if out[j] != "A" else "C"
        return "".join(out)

    b1, b2, infos = _make_pairs(seq, rng, 8, mutate_r1={i: scramble for i in range(8)})
    res = trained_aligner.align_batch_arrays(b1, b2)
    # at least most rows should be rescued
    assert res["aligned_1"].sum() >= 6
    for i, (p, tlen) in enumerate(infos):
        if res["aligned_1"][i]:
            # the semialigned clipper may soft-clip the scrambled head;
            # the unclipped start must equal the true position
            cig = res.get("cigar_1", [None] * 8)[i]
            lead = 0
            if cig and "S" in cig and cig.index("S") < cig.index("M"):
                lead = int(cig.split("S")[0])
            assert res["start_1"][i] - lead == p, (i, res["start_1"][i], p, cig)
            assert not res["reverse_1"][i]
    recs = trained_aligner.align_to_sam(b1, b2)
    r1 = [r for r in recs if r.flag & sam.FLAG_READ1]
    assert sum(1 for r in r1 if r.is_mapped) >= 6


def test_half_mapped_pair_flags(ref, trained_aligner):
    genome, seq, index = ref
    rng = np.random.default_rng(13)
    b1, b2, infos = _make_pairs(seq, rng, 2)
    # replace read 1 of pair 0 with junk that can't be rescued either
    junk = "GC" * (READ_LEN // 2)
    b1.bases[0] = np.asarray(list(dna.encode(junk)))
    res_recs = trained_aligner.align_to_sam(b1, b2)
    r1 = next(r for r in res_recs if r.qname == "p0" and r.flag & sam.FLAG_READ1)
    r2 = next(r for r in res_recs if r.qname == "p0" and r.flag & sam.FLAG_READ2)
    if not r1.is_mapped:  # rescue may legitimately fail on GC junk
        assert r2.flag & sam.FLAG_MATE_UNMAPPED
        assert r1.rname == r2.rname  # unmapped placed at mate
        assert r1.pos == r2.pos


def test_disjoined_pair_not_proper(ref, trained_aligner):
    genome, seq, index = ref
    # two reads from far apart -> no TLS-compatible pair
    b1 = batch_from_reads(["d0"], [seq[100 : 100 + READ_LEN]])
    b2 = batch_from_reads(["d0"], [dna.decode(dna.revcomp(dna.encode(
        seq[15000 : 15000 + READ_LEN])))])
    recs = trained_aligner.align_to_sam(b1, b2)
    r1, r2 = recs
    assert r1.is_mapped and r2.is_mapped
    assert not (r1.flag & sam.FLAG_PROPER_PAIR)
    assert r1.pos == 101
    assert r2.pos == 15001
