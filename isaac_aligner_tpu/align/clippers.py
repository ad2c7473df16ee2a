"""Read clipping: quality trim, adapter masking, semialigned ends,
overlapping pair ends.

Reference analogs:
- trimLowQualityEnd (src/c++/lib/alignment/Quality.cpp:72-120): for reads
  >= 35 bp, walk from the 3' end accumulating (cutoff - q); stop when the
  sum goes negative; mask through the running-max position.
- FragmentSequencingAdapterClipper
  (lib/alignment/matchSelector/FragmentSequencingAdapterClipper.cpp):
  known adapter sequences found near the 3' end are masked.  This
  implementation masks a suffix whose prefix matches an adapter with at
  most one mismatch (the reference's alignment-position-aware logic is
  richer; masked bases are soft-clipped identically).
- SemialignedEndsClipper (lib/alignment/matchSelector/
  SemialignedEndsClipper.cpp): soft-clip aligned ends until
  CONSECUTIVE_MATCHES_MIN=5 consecutive matches, adjusting position and
  edit distance (Alignment.hh clipMismatches).
- OverlappingEndsClipper (lib/alignment/matchSelector/
  OverlappingEndsClipper.cpp): for FR pairs whose gapless ends overlap,
  soft-clip the overlap from the end with the lower summed base quality.

Quality/adapter masking run host-side BEFORE the device pipeline (masked
bases become N/q0, which the scorer already treats as neutral matches and
whose seeds self-exclude); the post-alignment clippers rewrite CIGARs in
the batch result dict like the gapped polish stage.
"""

from __future__ import annotations

import numpy as np

from .. import dna
from ..io.bam import parse_cigar

CONSECUTIVE_MATCHES_MIN = 5
MASK_READ_LENGTH_MIN = 35


def quality_trim_batch(bases: np.ndarray, quals: np.ndarray,
                       cutoff: int,
                       tail_masked: np.ndarray | None = None) -> np.ndarray:
    """Mask low-quality 3' tails in place; returns per-read ADDITIONAL
    trim counts.  `tail_masked` gives bases already masked at the tail
    (e.g. by adapter clipping) which the scan must skip, not re-count."""
    b, l = bases.shape
    trims = np.zeros(b, np.int32)
    if cutoff <= 0 or l < MASK_READ_LENGTH_MIN:
        return trims
    for i in range(b):
        qs = 0
        peak = 0
        trim = 0
        start_j = l - 1 - (int(tail_masked[i]) if tail_masked is not None else 0)
        # walk from the (unmasked) read end toward the front, >= 35 bases kept
        for j in range(start_j, MASK_READ_LENGTH_MIN - 1, -1):
            qs += cutoff - int(quals[i, j])
            if qs < 0:
                break
            if qs > peak:
                peak = qs
                trim = start_j + 1 - j
        if trim:
            trims[i] = trim
            bases[i, start_j + 1 - trim :] = dna.N
            quals[i, start_j + 1 - trim :] = 0
    return trims


def adapter_trim_batch(bases: np.ndarray, quals: np.ndarray,
                       adapters: list[str], min_overlap: int = 8) -> np.ndarray:
    """Mask 3' adapter contamination in place; returns trim counts.

    A suffix is masked when it begins with >= min_overlap bases matching
    an adapter prefix with <= 1 mismatch, or when a shorter full suffix
    exactly matches an adapter prefix.
    """
    b, l = bases.shape
    trims = np.zeros(b, np.int32)
    if not adapters:
        return trims
    acodes = [dna.encode(a) for a in adapters]
    exact_min = 5   # shorter suffixes must match the adapter prefix exactly
    for i in range(b):
        read = bases[i]
        best = 0
        for a in acodes:
            for s in range(l - exact_min, -1, -1):
                n = min(l - s, len(a))
                mm = int((read[s : s + n] != a[:n]).sum())
                if (n >= min_overlap and mm <= 1) or \
                        (exact_min <= n < min_overlap and mm == 0):
                    best = max(best, l - s)
                    break
        if best:
            trims[i] = best
            bases[i, l - best :] = dna.N
            quals[i, l - best :] = 0
    return trims


def apply_masked_tail_cigar(res: dict, suffix: str, trims: np.ndarray,
                            read_len: int) -> None:
    """Turn masked tails into soft-clips in the result dict.

    Forward alignments clip at the CIGAR end; reverse alignments carry the
    masked read-tail at the genome-left side, so the clip leads and the
    position advances by the trim (the candidate start referenced the full
    oriented read).  Also corrects NM for the masked (N-scored) bases.
    """
    key = "cigar" + suffix
    if key not in res:
        res[key] = [None] * trims.shape[0]
    for i in np.nonzero(trims)[0]:
        if not res["aligned" + suffix][i]:
            continue
        t = int(trims[i])
        body = read_len - t
        cur = res[key][i]
        if cur is not None:
            continue  # gapped cigars already reflect the masked bases as N
        if res["reverse" + suffix][i]:
            res[key][i] = f"{t}S{body}M"
            res["start" + suffix][i] += t
        else:
            res[key][i] = f"{body}M{t}S"
        res["edit_distance" + suffix][i] = max(
            0, int(res["edit_distance" + suffix][i]) - t)


def _oriented_read(bases_row: np.ndarray, reverse: bool) -> np.ndarray:
    if reverse:
        return dna.revcomp(bases_row)
    return bases_row


def clip_semialigned(res: dict, suffix: str, genome_codes: np.ndarray,
                     bases: np.ndarray) -> None:
    """Soft-clip poorly aligned read ends (5-consecutive-match rule)."""
    aligned = res["aligned" + suffix]
    key = "cigar" + suffix
    if key not in res:
        res[key] = [None] * aligned.shape[0]
    for i in np.nonzero(aligned)[0]:
        cigar_str = res[key][i]
        if cigar_str is not None and any(op in cigar_str for op in "ID"):
            continue  # gapped alignments: reference skips realigned ends too
        start = int(res["start" + suffix][i])
        seq = _oriented_read(bases[i], bool(res["reverse" + suffix][i]))
        l = seq.shape[0]
        # existing soft clips from masking
        lead_s = 0
        tail_s = 0
        if cigar_str:
            parsed = parse_cigar(cigar_str)
            if parsed[0][1] == "S":
                lead_s = parsed[0][0]
            if parsed[-1][1] == "S":
                tail_s = parsed[-1][0]
        core = slice(lead_s, l - tail_s)
        ref = genome_codes[start : start + (core.stop - core.start)]
        s = seq[core]
        match = (s == dna.N) | ((s == ref) & (ref != dna.N))

        # left side: advance until CONSECUTIVE_MATCHES_MIN matches in a row
        def scan(m):
            run = 0
            for j, ok in enumerate(m):
                run = run + 1 if ok else 0
                if run == CONSECUTIVE_MATCHES_MIN:
                    return j - CONSECUTIVE_MATCHES_MIN + 1
            return 0
        left_clip = scan(match)
        right_clip = scan(match[::-1])
        if left_clip == 0 and right_clip == 0:
            continue
        n = core.stop - core.start
        if left_clip + right_clip + CONSECUTIVE_MATCHES_MIN >= n:
            continue  # would clip everything; leave as-is
        # removed mismatches no longer count toward NM
        removed_mm = int((~match[:left_clip]).sum() +
                         (~match[n - right_clip :]).sum())
        new_lead = lead_s + left_clip
        new_tail = tail_s + right_clip
        body = l - new_lead - new_tail
        parts = []
        if new_lead:
            parts.append(f"{new_lead}S")
        parts.append(f"{body}M")
        if new_tail:
            parts.append(f"{new_tail}S")
        res[key][i] = "".join(parts)
        res["start" + suffix][i] = start + left_clip
        res["edit_distance" + suffix][i] = max(
            0, int(res["edit_distance" + suffix][i]) - removed_mm)
        res["mismatches" + suffix][i] = max(
            0, int(res["mismatches" + suffix][i]) - removed_mm)


def clip_overlapping(res: dict, b1, b2, genome_codes: np.ndarray) -> None:
    """Clip the lower-quality end of overlapping FR pairs (gapless only)."""
    both = res["aligned_1"] & res["aligned_2"]
    for i in np.nonzero(both)[0]:
        r1_rev = bool(res["reverse_1"][i])
        r2_rev = bool(res["reverse_2"][i])
        if r1_rev == r2_rev:
            continue
        c1 = res.get("cigar_1", [None] * both.shape[0])[i]
        c2 = res.get("cigar_2", [None] * both.shape[0])[i]
        if (c1 and any(op in c1 for op in "ID")) or \
           (c2 and any(op in c2 for op in "ID")):
            continue
        p1, p2 = int(res["start_1"][i]), int(res["start_2"][i])
        l1, l2 = b1.read_len, b2.read_len
        if p1 <= p2:
            left, right = ("_1", "_2")
            lp, ll, rp, rl = p1, l1, p2, l2
            left_rev = r1_rev
            lq, rq = b1.quals[i], b2.quals[i]
        else:
            left, right = ("_2", "_1")
            lp, ll, rp, rl = p2, l2, p1, l1
            left_rev = r2_rev
            lq, rq = b2.quals[i], b1.quals[i]
        if left_rev:
            continue  # leftmost must face forward (FR), else mate-pair/adapter
        overlap = lp + ll - rp
        if overlap <= 0 or overlap >= ll or overlap >= rl:
            continue
        # compare summed qualities of the overlapping ends
        left_q = int(lq[ll - overlap :].sum())     # left read 3' tail
        # right read's genome-left bases are its 3' tail in read
        # coordinates (right is the reverse read)
        right_q = int(rq[rl - overlap :].sum())
        key = "cigar" + (right if left_q >= right_q else left)
        idx_sfx = right if left_q >= right_q else left
        if "cigar" + idx_sfx not in res:
            res["cigar" + idx_sfx] = [None] * both.shape[0]
        length = rl if idx_sfx == right else ll
        if idx_sfx == right:
            # clip the genome-left start of the right (reverse) read; in
            # read coordinates that is its 3' tail -> leading S, pos shift
            res["cigar" + idx_sfx][i] = f"{overlap}S{length - overlap}M"
            res["start" + idx_sfx][i] = rp + overlap
        else:
            res["cigar" + idx_sfx][i] = f"{length - overlap}M{overlap}S"
