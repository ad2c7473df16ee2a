"""BAM input: realign reads from an existing BAM file.

Reference analog: BamSeedSource + BamLoader/BamParser
(src/c++/include/workflow/alignWorkflow/BamDataSource.hh:41-155,
include/bam/BamParser.hh:130-194): reads come back in ORIGINAL strand
orientation (reverse-flagged records store the reverse complement, so we
undo it), pairs are matched by name + READ1/READ2 flags, and secondary/
supplementary records are skipped.
"""

from __future__ import annotations

from pathlib import Path


from .. import dna
from . import sam
from .bam import read_bam
from .fastq import ReadBatch, batch_from_reads


def reads_from_bam(path: str | Path) -> tuple[ReadBatch, ReadBatch | None]:
    """Extract reads from a BAM -> (read1 batch, read2 batch or None)."""
    _text, _refs, records = read_bam(path)
    r1: dict[str, tuple[str, str]] = {}
    r2: dict[str, tuple[str, str]] = {}
    order: list[str] = []
    paired = False
    for rec in records:
        if rec.flag & (sam.FLAG_SECONDARY | sam.FLAG_SUPPLEMENTARY):
            continue
        seq, qual = rec.seq, rec.qual
        if rec.flag & sam.FLAG_REVERSE and seq != "*":
            seq = dna.decode(dna.revcomp(dna.encode(seq)))
            qual = qual[::-1]
        if rec.flag & sam.FLAG_PAIRED:
            paired = True
            bucket = r2 if rec.flag & sam.FLAG_READ2 else r1
        else:
            bucket = r1
        if rec.qname not in r1 and rec.qname not in r2:
            order.append(rec.qname)
        elif rec.qname not in bucket:
            pass
        bucket.setdefault(rec.qname, (seq, qual))
        if rec.qname not in order:
            order.append(rec.qname)

    # keep only complete entries, preserving first-seen order
    seen = set()
    names = []
    for n in order:
        if n in seen:
            continue
        seen.add(n)
        if paired and (n not in r1 or n not in r2):
            continue  # orphan record in a paired BAM: drop (reference skips)
        names.append(n)
    if not names:
        raise ValueError(f"{path}: no usable reads")

    b1 = batch_from_reads(names, [r1[n][0] for n in names],
                          [r1[n][1] for n in names])
    if not paired:
        return b1, None
    b2 = batch_from_reads(names, [r2[n][0] for n in names],
                          [r2[n][1] for n in names])
    return b1, b2
