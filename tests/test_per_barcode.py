"""Per-barcode reference / adapters / TLS (workflow/per_barcode.py):
two barcodes align against two DIFFERENT references with different
learned insert-size models in one run; an 'unmapped' barcode skips
alignment (VERDICT r4 missing #4)."""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.io.bam import read_bam
from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions


@pytest.fixture(scope="module")
def per_barcode_run(tmp_path_factory):
    td = tmp_path_factory.mktemp("pbc")
    rng = np.random.default_rng(7)
    genomes = {}
    for name in ("refA", "refB"):
        codes = rng.integers(0, 4, 40_000).astype(np.uint8)
        (td / f"{name}.fa").write_text(
            f">{name}_c1\n" + "".join("ACGT"[c] for c in codes) + "\n")
        genomes[name] = codes

    bars = {"A": "ACGTACGT", "B": "TTGGCCAA", "U": "GGGGTTTT"}
    (td / "sheet.csv").write_text(
        "barcode,sample,reference,adapter\n"
        f"{bars['A']},sampleA,{td / 'refA.fa'},\n"
        f"{bars['B']},sampleB,{td / 'refB.fa'},\n"
        f"{bars['U']},spikein,unmapped,\n")

    # paired reads: sampleA insert ~250, sampleB insert ~400 (distinct
    # TLS must be learned per sample)
    qs = "I" * 80
    inserts = {"A": 250, "B": 400}
    with open(td / "r1.fq", "w") as f1, open(td / "r2.fq", "w") as f2, \
            open(td / "i1.fq", "w") as fb:
        i = 0
        for _ in range(120):
            for s in ("A", "B", "U"):
                if s == "U":
                    seq1 = "".join("ACGT"[c] for c in
                                   rng.integers(0, 4, 80))
                    seq2 = "".join("ACGT"[c] for c in
                                   rng.integers(0, 4, 80))
                else:
                    g = genomes[{"A": "refA", "B": "refB"}[s]]
                    t = inserts[s] + int(rng.integers(-15, 16))
                    p = int(rng.integers(0, 40_000 - t - 1))
                    seq1 = "".join("ACGT"[c] for c in g[p : p + 80])
                    m2 = g[p + t - 80 : p + t]
                    rc = np.where(m2[::-1] < 4, 3 - m2[::-1], m2[::-1])
                    seq2 = "".join("ACGT"[c] for c in rc)
                f1.write(f"@q{i}_{s}\n{seq1}\n+\n{qs}\n")
                f2.write(f"@q{i}_{s}\n{seq2}\n+\n{qs}\n")
                fb.write(f"@q{i}_{s}\n{bars[s]}\n+\n{'I' * 8}\n")
                i += 1

    wf = AlignWorkflow(WorkflowOptions(
        reference=str(td / "refA.fa"), output_dir=str(td / "out"),
        fastq1=str(td / "r1.fq"), fastq2=str(td / "r2.fq"),
        barcode_fastq=str(td / "i1.fq"), sample_sheet=str(td / "sheet.csv"),
        batch_size=64, tls_batches=2, records_per_bin=10_000))
    wf.run()
    return td, genomes


def test_per_sample_bams_against_own_references(per_barcode_run):
    td, genomes = per_barcode_run
    for sample, ref in (("sampleA", "refA"), ("sampleB", "refB")):
        bam = td / "out" / sample / "sorted.bam"
        assert bam.exists(), f"{sample} BAM missing"
        recs = read_bam(bam)[2]
        mine = [r for r in recs if r.qname.endswith(
            "_A" if sample == "sampleA" else "_B")]
        other = [r for r in recs if not r.qname.endswith(
            "_A" if sample == "sampleA" else "_B")]
        assert len(mine) == 240 and not other, (len(mine), len(other))
        aligned = [r for r in mine if not (r.flag & 4)]
        assert len(aligned) >= 230
        # every aligned record names this sample's OWN reference contig
        assert {r.rname for r in aligned} == {f"{ref}_c1"}
        # spot-verify sequence identity at the reported position
        g = genomes[ref]
        r = aligned[0]
        seq = dna.encode(r.seq.encode())
        want = g[r.pos - 1 : r.pos - 1 + len(seq)]
        assert (seq == want).mean() > 0.9


def test_distinct_tls_models_learned(per_barcode_run):
    import json
    td, _ = per_barcode_run
    stats = json.loads((td / "out" / "Stats"
                        / "PerBarcodeStats.json").read_text())
    tls_a = stats["sampleA"]["tls"]
    tls_b = stats["sampleB"]["tls"]
    assert abs(tls_a["median"] - 250) <= 20, tls_a
    assert abs(tls_b["median"] - 400) <= 20, tls_b


def test_unmapped_barcode_skips_alignment(per_barcode_run):
    td, _ = per_barcode_run
    recs = read_bam(td / "out" / "spikein" / "sorted.bam")[2]
    assert len(recs) == 240
    assert all(r.flag & 4 for r in recs)
    assert all(r.qname.endswith("_U") for r in recs)
