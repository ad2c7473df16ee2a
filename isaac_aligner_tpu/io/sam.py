"""SAM record model, text serialization, and the record-parity diff tool.

Reference analog: src/c++/include/bam/Bam.hh (serializeAlignment) and
build/FragmentAccessorBamAdapter.hh — we emit the same logical fields as
text SAM; the binary BAM/BGZF writer lives in io/bam.py.

The parity diff (`diff_records`) is the test oracle called out by
SURVEY.md §4: field-by-field comparison of SAM records between this
framework and reference-run output.
"""

from __future__ import annotations

import dataclasses

# SAM flag bits
FLAG_PAIRED = 0x1
FLAG_PROPER_PAIR = 0x2
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_READ1 = 0x40
FLAG_READ2 = 0x80
FLAG_SECONDARY = 0x100
FLAG_QC_FAIL = 0x200
FLAG_DUPLICATE = 0x400
FLAG_SUPPLEMENTARY = 0x800


@dataclasses.dataclass
class SamRecord:
    qname: str
    flag: int
    rname: str           # "*" if unmapped
    pos: int             # 1-based leftmost; 0 if unmapped
    mapq: int
    cigar: str           # "*" if unmapped
    rnext: str = "*"
    pnext: int = 0
    tlen: int = 0
    seq: str = "*"
    qual: str = "*"
    tags: dict[str, tuple[str, object]] = dataclasses.field(default_factory=dict)

    def set_tag(self, name: str, typ: str, value: object) -> None:
        self.tags[name] = (typ, value)

    def to_line(self) -> str:
        fields = [
            self.qname, str(self.flag), self.rname, str(self.pos), str(self.mapq),
            self.cigar, self.rnext, str(self.pnext), str(self.tlen), self.seq, self.qual,
        ]
        for name, (typ, value) in sorted(self.tags.items()):
            fields.append(f"{name}:{typ}:{value}")
        return "\t".join(fields)

    @property
    def is_mapped(self) -> bool:
        return not (self.flag & FLAG_UNMAPPED)

    @staticmethod
    def from_line(line: str) -> "SamRecord":
        parts = line.rstrip("\n").split("\t")
        if len(parts) < 11:
            raise ValueError(f"short SAM line: {line!r}")
        tags: dict[str, tuple[str, object]] = {}
        for t in parts[11:]:
            name, typ, value = t.split(":", 2)
            if typ == "i":
                value = int(value)
            elif typ == "f":
                value = float(value)
            tags[name] = (typ, value)
        return SamRecord(
            qname=parts[0], flag=int(parts[1]), rname=parts[2], pos=int(parts[3]),
            mapq=int(parts[4]), cigar=parts[5], rnext=parts[6], pnext=int(parts[7]),
            tlen=int(parts[8]), seq=parts[9], qual=parts[10], tags=tags,
        )


def header_lines(contigs, sample: str = "sample", program: str = "isaac_aligner_tpu",
                 version: str = "0.1.0",
                 extra_tags: tuple[str, ...] = (),
                 pu: str | None = None, description: str = "",
                 reference_name: str = "") -> list[str]:
    """@HD/@SQ/@RG/@PG header (reference: bam::serializeHeader,
    src/c++/include/bam/Bam.hh:94).  `extra_tags` carries literal
    additional header lines (reference --bam-header-tag; '\\t' in the
    flag value is already expanded by the CLI).  `pu` fills the RG PU
    field (reference --bam-pu-format, manual.md:281), `description` the
    @PG DS tag (--description, manual.md:366) and `reference_name` an
    @CO REFERENCE line (--reference-name, manual.md:485)."""
    lines = ["@HD\tVN:1.6\tSO:coordinate"]
    for c in contigs:
        lines.append(f"@SQ\tSN:{c.name}\tLN:{c.length}\tM5:{c.md5}")
    rg = f"@RG\tID:0\tSM:{sample}"
    if pu:
        rg += f"\tPU:{pu}"
    lines.append(rg)
    pg = f"@PG\tID:{program}\tPN:{program}\tVN:{version}"
    if description:
        pg += f"\tDS:{description}"
    lines.append(pg)
    if reference_name and reference_name != "default":
        lines.append(f"@CO\tREFERENCE:{reference_name}")
    lines.extend(extra_tags)
    return lines


def write_sam(path, records: list[SamRecord], contigs, **header_kw) -> None:
    with open(path, "w") as f:
        for line in header_lines(contigs, **header_kw):
            f.write(line + "\n")
        for r in records:
            f.write(r.to_line() + "\n")


def iter_sam(path):
    """Stream records from a SAM file (bounded memory for bin merging)."""
    with open(path) as f:
        for line in f:
            if not line.startswith("@") and line.strip():
                yield SamRecord.from_line(line)


def read_sam(path) -> tuple[list[str], list[SamRecord]]:
    headers: list[str] = []
    records: list[SamRecord] = []
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                headers.append(line.rstrip("\n"))
            elif line.strip():
                records.append(SamRecord.from_line(line))
    return headers, records


# ---------------------------------------------------------------------------
# Golden parity diff (SURVEY.md §4 "Implication for the rebuild")
# ---------------------------------------------------------------------------

CORE_FIELDS = ("flag", "rname", "pos", "mapq", "cigar", "rnext", "pnext", "tlen")


def diff_records(
    ours: list[SamRecord],
    golden: list[SamRecord],
    fields: tuple[str, ...] = CORE_FIELDS,
    compare_tags: tuple[str, ...] = (),
    mapq_tolerance: int = 0,
) -> list[str]:
    """Field-by-field SAM-record diff keyed by (qname, read-number).

    Returns a list of human-readable mismatch descriptions (empty == parity).
    """
    def key(r: SamRecord) -> tuple[str, int]:
        rn = 2 if (r.flag & FLAG_READ2) else 1
        return (r.qname, rn)

    ours_by = {key(r): r for r in ours if not (r.flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY))}
    gold_by = {key(r): r for r in golden if not (r.flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY))}

    problems: list[str] = []
    for k, g in gold_by.items():
        o = ours_by.get(k)
        if o is None:
            problems.append(f"{k}: missing from our output")
            continue
        for field in fields:
            ov, gv = getattr(o, field), getattr(g, field)
            if field == "mapq" and mapq_tolerance:
                if abs(int(ov) - int(gv)) <= mapq_tolerance:
                    continue
            if ov != gv:
                problems.append(f"{k}: {field} ours={ov!r} golden={gv!r}")
        for tag in compare_tags:
            ov = o.tags.get(tag)
            gv = g.tags.get(tag)
            if ov != gv:
                problems.append(f"{k}: tag {tag} ours={ov!r} golden={gv!r}")
    for k in ours_by:
        if k not in gold_by:
            problems.append(f"{k}: extra record in our output")
    return problems
