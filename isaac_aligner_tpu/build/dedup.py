"""Coordinate sorting and duplicate marking.

Reference analog: BinSorter::process (src/c++/lib/build/BinSorter.cpp:36-421)
and DuplicatePairEndFilter / DuplicateFragmentIndexFiltering
(include/build/DuplicateFragmentIndexFiltering.hh:43-180).

Semantics reproduced:
- duplicate key: per-end anchor = (reference id, UNCLIPPED 5' alignment
  position, orientation); paired records group by the canonically ordered
  (self anchor, mate anchor) pair, single-end by their own anchor (the
  reference's Se/FStrand/RStrandOrShadow index flavors collapse to this
  for mapped reads; shadow-hash anchoring for unmapped mates is
  approximated by the mate's anchor).
- ranking (io/Fragment.hh:66-71): rank = quality_sum << 32 |
  (total_len - edit_distance) << 16 | alignment_score; the highest rank
  in a group is kept, the rest get FLAG_DUPLICATE (or are dropped when
  keep=False, reference --keep-duplicates/--mark-duplicates).
"""

from __future__ import annotations

from ..io import sam
from ..io.bam import parse_cigar


def _unclipped_5prime(rec: sam.SamRecord) -> int:
    """5' alignment position extended through soft clips (dedup must see
    the original molecule end, not the clipped one)."""
    cigar = parse_cigar(rec.cigar) if rec.cigar != "*" else []
    pos = rec.pos
    if rec.flag & sam.FLAG_REVERSE:
        # 3'-side in file order == 5' of the reverse read: end position
        ref_len = sum(n for n, op in cigar if op in "MDN=X")
        end = pos + ref_len - 1
        for n, op in reversed(cigar):
            if op == "S":
                end += n
            else:
                break
        return end
    for n, op in cigar:
        if op == "S":
            pos -= n
        else:
            break
    return pos


unclipped_five_prime = _unclipped_5prime   # public: genomic binning uses it


def _anchor(rec: sam.SamRecord):
    return (rec.rname, _unclipped_5prime(rec), bool(rec.flag & sam.FLAG_REVERSE))


def _rank(recs: list[sam.SamRecord]) -> int:
    qsum = 0
    total = 0
    edit = 0
    score = 0
    for r in recs:
        if r.qual != "*":
            qsum += sum(ord(c) - 33 for c in r.qual)
        total += len(r.seq) if r.seq != "*" else 0
        edit += int(r.tags.get("NM", ("i", 0))[1])
        score += r.mapq
    return (qsum << 32) | (max(total - edit, 0) << 16) | min(score, 0xFFFF)


def mark_duplicates(records: list[sam.SamRecord], keep: bool = True
                    ) -> list[sam.SamRecord]:
    """Mark (or remove) duplicate templates.  Returns the record list
    (same objects, FLAG_DUPLICATE set on losers; filtered when keep=False).
    """
    by_name: dict[tuple[str, int], list[sam.SamRecord]] = {}
    for r in records:
        by_name.setdefault((r.qname, 1), []).append(r)

    groups: dict[tuple, list[tuple[int, list[sam.SamRecord]]]] = {}
    for (_name, _), recs in by_name.items():
        mapped = [r for r in recs if r.is_mapped]
        if not mapped:
            continue
        anchors = sorted(_anchor(r) for r in mapped)
        # library component: templates from different libraries are never
        # duplicates of each other (reference keys on (anchor, mate anchor,
        # library) unless all samples share one library,
        # include/build/DuplicateFragmentIndexFiltering.hh:43-180); the RG
        # tag carries our sample/library identity
        lib = str(recs[0].tags.get("RG", ("Z", ""))[1])
        if len(mapped) == 1 and len(recs) > 1:
            # half-mapped pair: anchor on the mapped end only, flagged so
            # it does not collide with fully-mapped pairs
            key = ("half", lib, tuple(anchors))
        elif len(mapped) == 1:
            key = ("se", lib, tuple(anchors))
        else:
            key = ("pe", lib, tuple(anchors))
        groups.setdefault(key, []).append((_rank(recs), recs))

    for _key, members in groups.items():
        if len(members) < 2:
            continue
        members.sort(key=lambda t: t[0], reverse=True)
        for _rnk, recs in members[1:]:
            for r in recs:
                r.flag |= sam.FLAG_DUPLICATE

    if keep:
        return records
    return [r for r in records if not (r.flag & sam.FLAG_DUPLICATE)]


# ---------------------------------------------------------------------------
# Columnar (FragmentBatch) versions — the production path.  Semantics are
# identical to the record-list versions above; tests assert equivalence.
# ---------------------------------------------------------------------------

def coordinate_sort_order(fb) -> "np.ndarray":
    """Row order for BAM coordinate sorting (vectorized
    PackedFragmentBuffer::orderForBam): (contig, pos, qname), records
    without a position last."""
    import numpy as np
    tid = fb.template_ids()           # lexicographic name rank
    n_refs = int(fb.ref_id.max()) + 1 if len(fb) else 0
    ref_key = np.where(fb.ref_id >= 0, fb.ref_id, n_refs)
    pos_key = np.where(fb.ref_id >= 0, fb.pos, 0)
    return np.lexsort((tid, pos_key, ref_key))


def mark_duplicates_batch(fb, contig_offsets, keep: bool = True):
    """Vectorized duplicate marking on a FragmentBatch.

    Same grouping/ranking as mark_duplicates: templates keyed by
    (class, library, canonical anchor pair); the highest
    (qual sum, len-edit, score) rank wins, the rest get FLAG_DUPLICATE.
    Returns the batch (rows dropped when keep=False).
    """
    import numpy as np

    from .storage import unclipped_5prime_global
    n = len(fb)
    if n == 0:
        return fb
    tid = fb.template_ids()
    order = np.argsort(tid, kind="stable")
    ts = tid[order]
    starts = np.concatenate([[0], 1 + np.nonzero(ts[1:] != ts[:-1])[0]])
    n_tpl = len(starts)

    mapped = (~(fb.flag & sam.FLAG_UNMAPPED).astype(bool)) & (fb.ref_id >= 0)
    anchor = unclipped_5prime_global(fb, contig_offsets)
    rev = (fb.flag & sam.FLAG_REVERSE).astype(bool)
    # composite per-row anchor key (contig, local anchor, strand); local
    # (not global) anchors so clip-extended anchors past a contig boundary
    # never collide with a neighboring contig's positions
    local = anchor - contig_offsets[np.maximum(fb.ref_id, 0)]
    akey = np.where(mapped,
                    (fb.ref_id.astype(np.int64) << 36)
                    | ((local + (1 << 20)) << 1) | rev,
                    np.iinfo(np.int64).max)

    # per-row rank components
    L = fb.qual.shape[1]
    in_read = np.arange(L)[None, :] < fb.length[:, None]
    qsum = (fb.qual.astype(np.int64) * in_read).sum(axis=1)
    edit = np.maximum(fb.nm, 0).astype(np.int64)
    score = fb.mapq.astype(np.int64)
    tlen_ = fb.length.astype(np.int64)

    # per-template reductions (templates have 1..2 rows)
    def seg_sum(v):
        return np.add.reduceat(v[order], starts)

    t_qsum = seg_sum(qsum)
    t_len = seg_sum(tlen_)
    t_edit = seg_sum(edit)
    t_score = seg_sum(score)
    t_mapped = seg_sum(mapped.astype(np.int64))
    t_paired = (fb.flag[order[starts]] & sam.FLAG_PAIRED).astype(bool)
    t_lib = fb.rg[order[starts]].astype(np.int64)
    rank = ((t_qsum << 32)
            | (np.maximum(t_len - t_edit, 0) << 16)
            | np.minimum(t_score, 0xFFFF))

    # canonical anchor pair per template (1-row templates: hi = sentinel)
    counts = np.diff(np.concatenate([starts, [n]]))
    first = akey[order[starts]]
    nxt = akey[order[np.minimum(starts + 1, n - 1)]]
    second = np.where(counts == 2, nxt, np.iinfo(np.int64).max)
    a_lo = np.minimum(first, second)
    a_hi = np.maximum(first, second)

    # class codes: 0=pe (2 mapped), 1=half (paired, 1 mapped), 2=se
    cls = np.where(t_mapped == 2, 0, np.where(t_paired, 1, 2))

    dup_tpl = np.zeros(n_tpl, bool)
    consider = t_mapped > 0
    ci = np.nonzero(consider)[0]
    if ci.size:
        g_order = ci[np.lexsort((-rank[ci], a_hi[ci], a_lo[ci],
                                 t_lib[ci], cls[ci]))]
        same = np.zeros(len(g_order), bool)
        if len(g_order) > 1:
            p, q = g_order[1:], g_order[:-1]
            same[1:] = ((cls[p] == cls[q]) & (t_lib[p] == t_lib[q])
                        & (a_lo[p] == a_lo[q]) & (a_hi[p] == a_hi[q]))
        dup_tpl[g_order[same]] = True

    row_dup = dup_tpl[np.searchsorted(ts[starts], tid)]
    fb.flag = np.where(row_dup, fb.flag | sam.FLAG_DUPLICATE,
                       fb.flag).astype(np.uint16)
    if keep:
        return fb
    return fb.take(np.nonzero(~row_dup)[0])


def coordinate_sort(records: list[sam.SamRecord], contigs) -> list[sam.SamRecord]:
    """Sort records in BAM coordinate order (unmapped-without-position
    last), reference PackedFragmentBuffer::orderForBam analog."""
    order = {c.name: c.index for c in contigs}

    def key(r: sam.SamRecord):
        if r.rname == "*":
            return (len(order), 0, r.qname)
        return (order[r.rname], r.pos, r.qname)

    return sorted(records, key=key)
