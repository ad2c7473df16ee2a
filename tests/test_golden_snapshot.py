"""Golden-snapshot regression: a deterministic fixture's SAM output is
pinned field-by-field (SURVEY.md §4's parity-harness strategy).  If an
intentional behavior change alters this, regenerate the golden block and
justify the diff in the commit message."""

import numpy as np

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.aligner import Aligner, PairedAligner
from isaac_aligner_tpu.align.pairs import TlsStatic
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import ReadBatch


def _fixture():
    rng = np.random.default_rng(12345)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 10_000))
    genome = genome_from_sequences([("chrG", seq)])
    return genome, build_index(genome, seed_len=32)


def _batch(rows, names):
    bases = np.stack(rows).astype(np.uint8)
    return ReadBatch(names=names, bases=bases,
                     quals=np.full(bases.shape, 35, np.uint8),
                     lengths=np.full(len(rows), bases.shape[1], np.int32))


def _core(r):
    nm = r.tags.get("NM", ("i", -1))[1]
    return f"{r.qname} {r.flag} {r.rname} {r.pos} {r.mapq} {r.cigar} NM:{nm}"


GOLDEN_SE = [
    "exact 0 chrG 2001 60 80M NM:0",
    "snp 0 chrG 4001 60 80M NM:1",
    "rc 16 chrG 6001 60 80M NM:0",
    "del5 0 chrG 8001 60 30M5D50M NM:5",
    "junk 4 * 0 0 * NM:-1",
]


def test_single_end_golden():
    genome, index = _fixture()
    L = 80
    g = genome.codes
    exact = g[2000:2080]
    snp = g[4000:4080].copy(); snp[40] = (snp[40] + 1) % 4
    rc = dna.revcomp(g[6000:6080])
    del5 = np.concatenate([g[8000:8030], g[8035:8085]])
    junk = dna.encode("".join("ACGT"[(7 * i + 3) % 4] for i in range(L)))
    batch = _batch([exact, snp, rc, del5, junk],
                   ["exact", "snp", "rc", "del5", "junk"])
    recs = Aligner.create(index, read_len=L, base_quality_cutoff=0).align_to_sam(batch)
    assert [_core(r) for r in recs] == GOLDEN_SE


GOLDEN_PE = [
    "p0 99 chrG 1001 60 70M NM:0",
    "p0 147 chrG 1231 60 70M NM:0",
    "p1 99 chrG 5001 60 70M NM:1",
    "p1 147 chrG 5231 60 70M NM:0",
]


def test_paired_golden():
    genome, index = _fixture()
    L = 70
    g = genome.codes
    r1s, r2s = [], []
    for s in (1000, 5000):
        r1s.append(g[s:s + L].copy())
        r2s.append(dna.revcomp(g[s + 300 - L:s + 300]))
    r1s[1][10] = (r1s[1][10] + 1) % 4
    al = PairedAligner.create(index, read_len=L, base_quality_cutoff=0)
    al.tls = TlsStatic(min=200, max=400, mate_min=200, mate_max=400,
                       best0=1, best1=6)
    recs = al.align_to_sam(_batch(r1s, ["p0", "p1"]), _batch(r2s, ["p0", "p1"]))
    assert [_core(r) for r in recs] == GOLDEN_PE
