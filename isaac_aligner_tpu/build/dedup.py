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


def _dup_classes(fb):
    """Per-record duplicate class column (shared by the host and the
    collective markers): 0=pe, 1=half (mapped end, shadow mate),
    2=shadow, 3=se, -1=skip."""
    import numpy as np

    n = len(fb)
    paired = (fb.flag & sam.FLAG_PAIRED).astype(bool)
    self_mapped = ~(fb.flag & sam.FLAG_UNMAPPED).astype(bool)
    mate_mapped = ~(fb.flag & sam.FLAG_MATE_UNMAPPED).astype(bool)
    cls = np.full(n, -1, np.int64)
    cls[paired & self_mapped & mate_mapped] = 0
    cls[paired & self_mapped & ~mate_mapped] = 1
    cls[paired & ~self_mapped & mate_mapped] = 2
    cls[~paired & self_mapped] = 3
    return cls


def mark_duplicates_collective(fb, mesh, keep: bool = True, lib=None):
    """SPMD duplicate marking over every device of `mesh` — the same
    (class, library, own anchor, mate anchor) grouping + rank/tie pick as
    mark_duplicates_batch, executed by parallel.sharded.collective_dedup
    (records route to their anchor's owner device over ICI all_to_all,
    owners sort + mark on device, flags route home).

    Reference analog: the per-bin dedup of Build::sortBinParallel
    (lib/build/BinSorter.cpp:36-421) scaled across devices (SURVEY §5.8
    "collective shuffle onto position-sharded owners + on-device sort").
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from ..parallel.sharded import collective_dedup

    n = len(fb)
    if n == 0:
        return fb
    cls = _dup_classes(fb)
    # --single-library-samples 0: caller passes per-(sample, lane) library
    # ids; default = per-sample (reference default 1, manual.md:528-531)
    lib = fb.rg.astype(np.int64) if lib is None else np.asarray(lib, np.int64)
    devices = np.asarray(mesh.devices).reshape(-1)
    n_dev = devices.size
    mesh1d = Mesh(devices, ("dev",))
    pad = (-n) % n_dev

    def padded(v, fill=0):
        v = np.asarray(v, np.int64)
        return np.concatenate([v, np.full(pad, fill, np.int64)]) if pad else v

    flags, overflow = collective_dedup(
        mesh1d, "dev", padded(fb.anchor_self), padded(fb.anchor_mate),
        padded(fb.dup_rank), padded(fb.dup_tie), padded(cls, -1),
        padded(lib))
    dup = np.asarray(jax.device_get(flags))[:n]
    n_over = int(np.asarray(jax.device_get(overflow)).sum())
    if n_over:
        # overflowed rows were kept as non-duplicates — never silently
        # wrong-marked, but the miss must be visible
        from ..utils import tracing
        tracing.log(f"collective dedup: {n_over} rows overflowed receive "
                    f"capacity and were kept unmarked", force=True)
    fb.flag = np.where(dup, fb.flag | sam.FLAG_DUPLICATE,
                       fb.flag).astype(np.uint16)
    if keep:
        return fb
    return fb.take(np.nonzero(~dup)[0])


def mark_duplicates_batch(fb, contig_offsets, keep: bool = True,
                          lib=None):
    """Vectorized per-bin duplicate marking on a FragmentBatch.

    Reference semantics (DuplicateFragmentIndexFiltering.hh:43-180):
    each RECORD groups by (class, library, own anchor, mate anchor) using
    the dedup columns precomputed at conversion time
    (storage.finalize_dup_columns); the highest template-level
    duplicateClusterRank wins its group, every other record gets
    FLAG_DUPLICATE.  Because both ends of a template carry the same rank
    and mirrored anchors, per-bin decisions agree across bins even when
    a pair's two records land in different bins.  Returns the batch
    (rows dropped when keep=False).
    """
    import numpy as np

    n = len(fb)
    if n == 0:
        return fb
    cls = _dup_classes(fb)
    lib = fb.rg.astype(np.int64) if lib is None else np.asarray(lib, np.int64)
    dup = np.zeros(n, bool)
    ci = np.nonzero(cls >= 0)[0]
    if ci.size:
        g_order = ci[np.lexsort((-fb.dup_tie[ci], -fb.dup_rank[ci],
                                 fb.anchor_mate[ci], fb.anchor_self[ci],
                                 lib[ci], cls[ci]))]
        same = np.zeros(len(g_order), bool)
        if len(g_order) > 1:
            p, q = g_order[1:], g_order[:-1]
            same[1:] = ((cls[p] == cls[q]) & (lib[p] == lib[q])
                        & (fb.anchor_self[p] == fb.anchor_self[q])
                        & (fb.anchor_mate[p] == fb.anchor_mate[q]))
        dup[g_order[same]] = True

    fb.flag = np.where(dup, fb.flag | sam.FLAG_DUPLICATE,
                       fb.flag).astype(np.uint16)
    if keep:
        return fb
    return fb.take(np.nonzero(~dup)[0])


def coordinate_sort(records: list[sam.SamRecord], contigs) -> list[sam.SamRecord]:
    """Sort records in BAM coordinate order (unmapped-without-position
    last), reference PackedFragmentBuffer::orderForBam analog."""
    order = {c.name: c.index for c in contigs}

    def key(r: sam.SamRecord):
        if r.rname == "*":
            return (len(order), 0, r.qname)
        return (order[r.rname], r.pos, r.qname)

    return sorted(records, key=key)
