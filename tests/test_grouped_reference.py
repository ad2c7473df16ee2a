"""Auto contig-grouping: sort-reference splits over-limit genomes into
group indexes + manifest; align consumes the grouped directory."""

import json

import numpy as np

from isaac_aligner_tpu.index.build import SeedIndex, build_index
from isaac_aligner_tpu.index.groups import (build_grouped_indexes,
                                            is_grouped_reference,
                                            load_grouped_indexes,
                                            subset_genome)
from isaac_aligner_tpu.io.fasta import genome_from_sequences


def _genome(seed=5):
    rng = np.random.default_rng(seed)
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    return genome_from_sequences([("cA", mk(4000)), ("cB", mk(3500)),
                                  ("cC", mk(1500))])


def test_subset_genome_rebases_offsets():
    g = _genome()
    sub = subset_genome(g, ["cB", "cC"])
    assert [c.name for c in sub.contigs] == ["cB", "cC"]
    assert sub.contigs[0].offset == 0 and sub.contigs[1].offset == 3500
    assert np.array_equal(sub.codes[:3500], g.codes[4000:7500])
    assert np.array_equal(sub.codes[3500:], g.codes[7500:])


def test_build_grouped_indexes_manifest(tmp_path):
    g = _genome()
    dirs = build_grouped_indexes(g, tmp_path / "idx", limit=6000)
    # greedy order-preserving: [cA], [cB, cC]
    assert [d.name for d in dirs] == ["group_00", "group_01"]
    assert is_grouped_reference(tmp_path / "idx")
    manifest = json.loads((tmp_path / "idx" / "multi-reference.json").read_text())
    assert manifest["total_length"] == g.total_length
    idxs = load_grouped_indexes(tmp_path / "idx")
    assert [c.name for c in idxs[0].genome.contigs] == ["cA"]
    assert [c.name for c in idxs[1].genome.contigs] == ["cB", "cC"]
    # each group index equals an independent build of its subset
    ref1 = build_index(subset_genome(g, ["cB", "cC"]), seed_len=32)
    assert np.array_equal(idxs[1].key_hi, ref1.key_hi)
    assert np.array_equal(idxs[1].pos, ref1.pos)


def test_build_grouped_streaming_matches(tmp_path):
    g = _genome(seed=9)
    a = build_grouped_indexes(g, tmp_path / "ram", limit=6000)
    b = build_grouped_indexes(g, tmp_path / "st", limit=6000,
                              streaming=True, mask_width=3)
    for da, db in zip(a, b):
        ia, ib = SeedIndex.load(da), SeedIndex.load(db)
        assert np.array_equal(ia.key_hi, ib.key_hi)
        assert np.array_equal(ia.key_lo, ib.key_lo)
        assert np.array_equal(ia.pos, ib.pos)


def test_workflow_grouped_reference(tmp_path):
    """sort-reference auto-grouping end-to-end: align --reference <grouped
    dir> must place reads identically to comma-separated group dirs."""
    from isaac_aligner_tpu.cli import main as cli_main
    from isaac_aligner_tpu.io.bam import read_bam
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    g = _genome(seed=13)
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as f:
        for c in g.contigs:
            seq = "".join("ACGTN"[x] for x in g.codes[c.offset:c.end])
            f.write(f">{c.name}\n{seq}\n")
    rc = cli_main(["sort-reference", "-g", str(fa), "-o",
                   str(tmp_path / "idx"), "--group-limit", "6000",
                   "--dont-annotate"])
    assert rc == 0 and is_grouped_reference(tmp_path / "idx")

    L = 80
    reads = {
        "a1000": "".join("ACGTN"[c] for c in g.codes[1000:1000 + L]),      # cA
        "b0500": "".join("ACGTN"[c] for c in g.codes[4500:4500 + L]),      # cB
        "c0200": "".join("ACGTN"[c] for c in g.codes[7700:7700 + L]),      # cC
    }
    (tmp_path / "r.fq").write_text("".join(
        f"@{n}\n{r}\n+\n{'I' * L}\n" for n, r in reads.items()))

    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(tmp_path / "idx"), output_dir=str(out),
        fastq1=str(tmp_path / "r.fq"), batch_size=8,
        realign_gaps="no")).run()
    recs = read_bam(out / "sorted.bam")[2]
    by = {r.qname: (r.rname, r.pos) for r in recs}
    assert by == {"a1000": ("cA", 1001), "b0500": ("cB", 501),
                  "c0200": ("cC", 201)}

    # identical placements via explicit comma-separated group dirs
    out2 = tmp_path / "out2"
    AlignWorkflow(WorkflowOptions(
        reference=f"{tmp_path}/idx/group_00,{tmp_path}/idx/group_01",
        output_dir=str(out2), fastq1=str(tmp_path / "r.fq"), batch_size=8,
        realign_gaps="no")).run()
    recs2 = read_bam(out2 / "sorted.bam")[2]
    assert [(r.qname, r.rname, r.pos, r.mapq) for r in recs2] == \
        [(r.qname, r.rname, r.pos, r.mapq) for r in recs]


def test_workflow_fasta_autogroup(tmp_path):
    """align -r over-limit.fa auto-splits into contig-group indexes."""
    from isaac_aligner_tpu.io.bam import read_bam
    from isaac_aligner_tpu.workflow.align import AlignWorkflow, WorkflowOptions

    g = _genome(seed=17)
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as f:
        for c in g.contigs:
            seq = "".join("ACGTN"[x] for x in g.codes[c.offset:c.end])
            f.write(f">{c.name}\n{seq}\n")
    L = 80
    reads = {"a0700": "".join("ACGTN"[c] for c in g.codes[700:700 + L]),
             "c0300": "".join("ACGTN"[c] for c in g.codes[7800:7800 + L])}
    (tmp_path / "r.fq").write_text("".join(
        f"@{n}\n{r}\n+\n{'I' * L}\n" for n, r in reads.items()))

    out = tmp_path / "out"
    AlignWorkflow(WorkflowOptions(
        reference=str(fa), output_dir=str(out),
        fastq1=str(tmp_path / "r.fq"), batch_size=8,
        group_limit=6000, realign_gaps="no")).run()
    recs = read_bam(out / "sorted.bam")[2]
    by = {r.qname: (r.rname, r.pos) for r in recs}
    assert by == {"a0700": ("cA", 701), "c0300": ("cC", 301)}
