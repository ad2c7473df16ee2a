"""Known-gap realignment of the output bins.

Reference analog: build::GapRealigner + RealignerGaps
(src/c++/include/build/GapRealigner.hh:37-120,
src/c++/lib/build/GapRealigner.cpp:494-1053): during the BAM-build phase,
collect every indel gap observed by any read of the bin (grouped per
sample / per project / across all samples, flag --realign-gaps), then for
each fragment enumerate combinations of known gaps overlapping its span
(findStartPos/verifyGapsChoice), accept a choice that strictly reduces
the mismatch count (applyChoice), preserve the original CIGAR in the OC
tag, and patch mate position / template length on both ends
(updatePairDetails).

TPU-native framing: this is a bin-local host post-pass exactly like the
reference's (it runs in the Build phase, after the device alignment
pipeline).  The mismatch counting for every (read, gap-choice) candidate
is vectorized numpy over the genome/read code arrays rather than the
reference's per-base scalar walk; the combination enumeration keeps the
reference's bounded shape (at most MAX_GAPS_AT_A_TIME gaps per choice).
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import defaultdict

import numpy as np

from .. import dna
from ..align.gapped import NORM_EXTEND, NORM_MAX_EXTEND, NORM_MISMATCH, NORM_OPEN
from ..io import sam
from ..io.bam import parse_cigar
from ..io.fasta import Genome

#: max known gaps combined into one realignment choice (the reference
#: enumerates combinations of overlapping gaps with a comparable bound —
#: GapRealigner::realign gives up on overly gap-dense regions)
MAX_GAPS_AT_A_TIME = 4

#: max candidate gaps per read span before giving up entirely
MAX_OVERLAPPING_GAPS = 10


@dataclasses.dataclass(frozen=True, order=True)
class Gap:
    """One observed indel: `pos` is the 0-based reference coordinate of the
    first deleted base (D) or of the base following the insertion (I)."""

    rname: str
    pos: int
    length: int
    is_insertion: bool

    @property
    def norm_cost(self) -> int:
        return NORM_OPEN + min(NORM_MAX_EXTEND, (self.length - 1) * NORM_EXTEND)


def collect_gaps(records: list[sam.SamRecord]) -> dict[str, list[Gap]]:
    """RealignerGaps::addGapsFromFragment — harvest indels from CIGARs."""
    seen: dict[str, set[tuple[int, int, bool]]] = defaultdict(set)
    for r in records:
        if not r.is_mapped or r.cigar in ("*", ""):
            continue
        for g in _gaps_of(parse_cigar(r.cigar), r.pos - 1, r.rname):
            seen[r.rname].add((g.pos, g.length, g.is_insertion))
    return {rn: sorted(Gap(rn, p, ln, ins) for p, ln, ins in gaps)
            for rn, gaps in seen.items()}


def _gaps_of(cigar: list[tuple[int, str]], start: int, rname: str) -> list[Gap]:
    out = []
    rpos = start
    for n, op in cigar:
        if op in ("M", "=", "X", "N"):
            rpos += n
        elif op == "D":
            out.append(Gap(rname, rpos, n, False))
            rpos += n
        elif op == "I":
            out.append(Gap(rname, rpos, n, True))
    return out


def _cigar_clips(cigar: list[tuple[int, str]]) -> tuple[int, int, list[tuple[int, str]]]:
    """Split leading/trailing soft clips from the aligned core."""
    left = right = 0
    core = list(cigar)
    if core and core[0][1] == "S":
        left = core[0][0]
        core = core[1:]
    if core and core[-1][1] == "S":
        right = core[-1][0]
        core = core[:-1]
    return left, right, core


def _choice_cigar(read_span: int, start: int, gaps: list[Gap]):
    """Thread `read_span` aligned bases from reference `start` across `gaps`.

    Returns (cigar_core, segments) where segments is a list of
    (read_off, ref_pos, length) M-blocks, or None when the choice is
    inconsistent (gap outside the read, empty head/tail M, overlap).
    """
    cigar: list[tuple[int, str]] = []
    segments: list[tuple[int, int, int]] = []
    roff = 0          # read bases consumed
    rpos = start      # reference cursor
    for g in gaps:
        head = g.pos - rpos
        if head <= 0:
            return None
        if g.is_insertion:
            if roff + head + g.length >= read_span:
                return None
            cigar.append((head, "M"))
            segments.append((roff, rpos, head))
            cigar.append((g.length, "I"))
            roff += head + g.length
            rpos += head
        else:
            if roff + head >= read_span:
                return None
            cigar.append((head, "M"))
            segments.append((roff, rpos, head))
            cigar.append((g.length, "D"))
            roff += head
            rpos += head + g.length
    tail = read_span - roff
    cigar.append((tail, "M"))
    segments.append((roff, rpos, tail))
    return cigar, segments


def _count_mismatches(codes: np.ndarray, genome_codes: np.ndarray, offset: int,
                      segments) -> int:
    mm = 0
    for roff, rpos, length in segments:
        ref = genome_codes[offset + rpos : offset + rpos + length]
        if ref.shape[0] != length:
            return 1 << 30
        rd = codes[roff : roff + length]
        mm += int(np.sum((rd != ref) | (rd >= 4) | (ref >= 4)))
    return mm


def _score(mm: int, gaps: list[Gap]) -> tuple[int, int, int]:
    """(mismatches, normalized gap+mismatch score, gap count) — the
    reference isBetterChoice order (fewest mismatches, then cheapest)."""
    return (mm, mm * NORM_MISMATCH + sum(g.norm_cost for g in gaps), len(gaps))


def realign_records(records: list[sam.SamRecord], genome: Genome,
                    gaps_by_rname: dict[str, list[Gap]] | None = None) -> int:
    """Realign every record against the bin's known gaps.

    Mutates records in place (CIGAR/pos/NM/OC) and patches mate
    PNEXT/TLEN; returns the number of records whose CIGAR changed.
    """
    if gaps_by_rname is None:
        gaps_by_rname = collect_gaps(records)
    contig_offset = {c.name: c.offset for c in genome.contigs}
    contig_len = {c.name: c.length for c in genome.contigs}
    gcodes = genome.codes
    n_changed = 0

    gap_pos = {rn: np.array([g.pos for g in gs], np.int64)
               for rn, gs in gaps_by_rname.items()}

    for rec in records:
        if not rec.is_mapped or rec.cigar in ("*", "") or rec.seq == "*":
            continue
        gaps = gaps_by_rname.get(rec.rname)
        if not gaps:
            continue
        cig = parse_cigar(rec.cigar)
        left_clip, right_clip, core = _cigar_clips(cig)
        if not core or any(op not in ("M", "I", "D") for _, op in core):
            continue
        read_span = sum(n for n, op in core if op in ("M", "I"))
        ref_span = sum(n for n, op in core if op in ("M", "D"))
        if read_span <= 0:
            continue
        start = rec.pos - 1

        pos_arr = gap_pos[rec.rname]
        lo = int(np.searchsorted(pos_arr, start, side="right"))
        hi = int(np.searchsorted(pos_arr, start + ref_span, side="left"))
        cand = gaps[lo:hi]
        if not cand or len(cand) > MAX_OVERLAPPING_GAPS:
            continue

        codes = dna.encode(rec.seq)[left_clip : left_clip + read_span]
        off = contig_offset[rec.rname]
        clen = contig_len[rec.rname]

        # cost of the existing alignment (verifyGapsChoice of own gaps)
        own = _gaps_of(core, start, rec.rname)
        made = _choice_cigar(read_span, start, own)
        if made is None:
            continue
        _, cur_segs = made
        cur_mm = _count_mismatches(codes, gcodes, off, cur_segs)
        best = _score(cur_mm, own)
        best_core = None
        best_gaps: list[Gap] = []

        k = min(len(cand), MAX_GAPS_AT_A_TIME)
        own_key = set(own)
        for r_ in range(1, k + 1):
            for combo in itertools.combinations(cand, r_):
                if set(combo) == own_key:
                    continue
                made = _choice_cigar(read_span, start, list(combo))
                if made is None:
                    continue
                new_core, segs = made
                if segs[-1][1] + segs[-1][2] > clen:
                    continue
                mm = _count_mismatches(codes, gcodes, off, segs)
                score = _score(mm, list(combo))
                if score < best:
                    best, best_core, best_gaps = score, new_core, list(combo)
        if best_core is None:
            continue

        oc = rec.cigar
        full = ([(left_clip, "S")] if left_clip else []) + best_core + \
            ([(right_clip, "S")] if right_clip else [])
        rec.cigar = "".join(f"{n}{op}" for n, op in full)
        rec.set_tag("OC", "Z", oc)
        rec.set_tag("NM", "i", best[0] + sum(g.length for g in best_gaps))
        n_changed += 1

    if n_changed:
        _patch_mates(records)
    return n_changed


def _ref_len(cigar_str: str) -> int:
    return sum(n for n, op in parse_cigar(cigar_str)
               if op in ("M", "D", "N", "=", "X"))


def _patch_mates(records: list[sam.SamRecord]) -> None:
    """Recompute PNEXT/TLEN after CIGAR rewrites (reference
    GapRealigner updatePairDetails)."""
    by_name: dict[str, list[sam.SamRecord]] = defaultdict(list)
    for r in records:
        if r.flag & sam.FLAG_PAIRED and r.is_mapped \
                and not (r.flag & (sam.FLAG_SECONDARY | sam.FLAG_SUPPLEMENTARY)):
            by_name[r.qname].append(r)
    for pair in by_name.values():
        if len(pair) != 2:
            continue
        a, b = pair
        if a.rname != b.rname:
            continue
        a.pnext, b.pnext = b.pos, a.pos
        left, right = (a, b) if a.pos <= b.pos else (b, a)
        span = (right.pos - 1 + _ref_len(right.cigar)) - (left.pos - 1)
        left.tlen, right.tlen = span, -span


# ---------------------------------------------------------------------------
# Columnar bridge (production path): realign only the sparse candidate set
# ---------------------------------------------------------------------------

def realign_batch(fb, genome: Genome, scope_rows: np.ndarray | None = None
                  ) -> int:
    """Gap-realign a FragmentBatch in place.

    Vectorized pre-filter picks the sparse work set — gap donor rows
    (CIGARs containing I/D) and rows whose reference span overlaps a
    known gap — and only those templates cross the SamRecord bridge into
    `realign_records`.  `scope_rows` restricts gap sharing (per-sample /
    per-project --realign-gaps scopes).  Returns #records changed.
    """
    from ..io import sam as sam_mod
    from . import records as R
    from .records import to_sam_records, update_from_sam_records

    n = len(fb)
    if n == 0:
        return 0
    rows = np.arange(n) if scope_rows is None else np.asarray(scope_rows)
    sub_mask = np.zeros(n, bool)
    sub_mask[rows] = True
    mapped = sub_mask & (~(fb.flag & sam_mod.FLAG_UNMAPPED).astype(bool)) \
        & (fb.ref_id >= 0) & (fb.n_cigar > 0)

    # donor rows: any I/D op inside the cigar
    c = fb.cigar_ops.shape[1]
    valid = np.arange(c)[None, :] < fb.n_cigar[:, None]
    opc = (fb.cigar_ops & 0xF).astype(np.int32)
    has_gap = (((opc == 1) | (opc == 2)) & valid).any(axis=1) & mapped
    if not has_gap.any():
        return 0
    donor_rows = np.nonzero(has_gap)[0]
    gaps = collect_gaps(to_sam_records(fb.take(donor_rows), genome.contigs))
    if not gaps:
        return 0

    # candidate rows: a known gap strictly inside (start, start+ref_span)
    span = R.ref_span(fb.cigar_ops, fb.n_cigar.astype(np.int64))
    cand = np.zeros(n, bool)
    for ci, contig in enumerate(genome.contigs):
        if contig.name not in gaps:
            continue
        gp = np.array([g.pos for g in gaps[contig.name]], np.int64)
        on = mapped & (fb.ref_id == ci)
        if not on.any():
            continue
        start = fb.pos[on].astype(np.int64)
        lo = np.searchsorted(gp, start, side="right")
        hi = np.searchsorted(gp, start + span[on], side="left")
        cand[np.nonzero(on)[0][hi > lo]] = True
    if not cand.any():
        return 0

    # pull whole templates (mates needed for PNEXT/TLEN patching)
    tid = fb.template_ids()
    cand_tids = np.unique(tid[cand])
    take = np.nonzero(np.isin(tid, cand_tids) & sub_mask)[0]
    recs = to_sam_records(fb.take(take), genome.contigs)
    changed = realign_records(recs, genome, gaps)
    if changed:
        update_from_sam_records(fb, take, recs, genome.contigs)
    return changed
