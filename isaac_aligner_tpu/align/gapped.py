"""Gapped-alignment polish: re-align poor ungapped hits with banded SW.

Reference analog: GappedAligner (src/c++/lib/alignment/fragmentBuilder/
GappedAligner.cpp:167-253) — candidates whose ungapped alignment shows
more than `mismatchesCutoff` (5) mismatches are re-aligned with the
banded Smith-Waterman over a window of read_len + 15 reference bases
(flanks split 7/8 via getFlanks), and the gapped result replaces the
ungapped one when its normalized SW score is better (reference
FragmentBuilder update rule).  The reference's 7-mer-hash
`makesSenseToGapAlign` pre-filter (GappedAligner.cpp:59-165) exists to
save CPU; the TPU kernel is cheap enough to run on every triggered row,
which is strictly more sensitive.  With --avoid-smith-waterman the
pre-filter IS applied (makes_sense_to_gap_align below, same 7-mer /
8-hits / two-confirmed-offsets rule) — on the TPU pipeline its value is
saving the HOST traceback/rescore work and device round-trips, not the
DP itself.

This stage runs as a host-orchestrated post-pass over the batch result
dict (same pattern as shadow rescue): trigger rows are compacted, padded
to the kernel block, scored on device, and tracebacks/CIGARs are built
host-side in numpy.
"""

from __future__ import annotations

import numpy as np

from ..index.build import SeedIndex
from ..ops import sw
from . import quality
from .pipeline import AlignConfig

#: ungapped mismatch count that triggers gap alignment
#: (BandedSmithWaterman.hh:94 mismatchesCutoff)
MISMATCHES_CUTOFF = 5

import dataclasses


@dataclasses.dataclass(frozen=True)
class GapScoring:
    """--gap-scoring parameters (AlignOptions.cpp:409,693; presets
    bwa = 0:-3:-11:-4:-20, eland = 2:-1:-15:-3:-25).

    Normalization follows AlignerBase.cpp:38-41: normalized X = match - X,
    max gap extend = -min_extend.
    """

    match: float = 0.0
    mismatch: float = -3.0
    open: float = -11.0
    extend: float = -4.0
    min_extend: float = -20.0

    @property
    def norm_mismatch(self) -> int:
        return int(self.match - self.mismatch)

    @property
    def norm_open(self) -> int:
        return int(self.match - self.open)

    @property
    def norm_extend(self) -> int:
        return int(self.match - self.extend)

    @property
    def norm_max_extend(self) -> int:
        return int(-self.min_extend)

    def sw_scores(self) -> tuple[float, float, float, float]:
        """(match, mismatch, open, extend) for ops.sw kernels (static)."""
        return (self.match, self.mismatch, self.open, self.extend)

    @staticmethod
    def parse(spec: str) -> "GapScoring":
        if spec == "bwa":
            return BWA
        if spec == "eland":
            return ELAND
        parts = [float(x) for x in spec.split(":")]
        if len(parts) not in (4, 5):
            raise ValueError(
                f"--gap-scoring {spec!r}: want bwa, eland or m:mm:go:ge[:me]")
        if len(parts) == 4:
            parts.append(-20.0)
        return GapScoring(*parts)


BWA = GapScoring()
ELAND = GapScoring(2.0, -1.0, -15.0, -3.0, -25.0)

# module-level defaults kept for callers that do not thread a GapScoring
NORM_MISMATCH = BWA.norm_mismatch
NORM_OPEN = BWA.norm_open
NORM_EXTEND = BWA.norm_extend
NORM_MAX_EXTEND = BWA.norm_max_extend


def _flanks(local_pos: int, read_len: int, contig_len: int) -> tuple[int, int] | None:
    """Left/right reference flanks summing to BAND-1 (getFlanks)."""
    total = sw.BAND - 1
    left = min(7, local_pos)
    right = total - left
    if local_pos + read_len + right > contig_len:
        right = contig_len - local_pos - read_len
        left = total - right
        if right < 0 or left > local_pos:
            return None
    return left, right


def cigar_stats(cigar: list[tuple[int, str]], gs: GapScoring = BWA):
    """(observed_ref_length, gap_bases, gap_count, normalized_gap_score)."""
    obs = 0
    gap_bases = 0
    gap_count = 0
    norm = 0
    for length, op in cigar:
        if op in ("M", "D"):
            obs += length if op in ("M", "D") else 0
        if op in ("I", "D"):
            gap_bases += length
            gap_count += 1
            norm += gs.norm_open + min(gs.norm_max_extend,
                                       (length - 1) * gs.norm_extend)
    return obs, gap_bases, gap_count, norm


def cigar_to_str(cigar: list[tuple[int, str]]) -> str:
    return "".join(f"{n}{op}" for n, op in cigar)


def rescore_cigar(genome_codes, start, seq, quals, cigar,
                  gs: GapScoring = BWA):
    """Reference updateFragmentCigar over an explicit CIGAR (host, f64).

    Returns (log_prob, scoring_mismatches, edit_distance, norm_score).
    """
    lp = 0.0
    nmm = 0
    edit = 0
    norm = 0
    qpos = 0
    rpos = int(start)
    for length, op in cigar:
        if op == "M":
            for _ in range(length):
                s = int(seq[qpos]); r = int(genome_codes[rpos]); q = int(quals[qpos])
                is_match = (s == 4) or (s == r and r != 4)
                if is_match:
                    lp += quality.LOG_MATCH_F64[q]
                else:
                    lp += quality.LOG_MISMATCH_F64[q]
                    nmm += 1
                    norm += gs.norm_mismatch
                if s != r or s == 4:
                    edit += 1
                qpos += 1
                rpos += 1
        elif op == "I":
            qpos += length
            edit += length
            norm += gs.norm_open + min(gs.norm_max_extend,
                                       (length - 1) * gs.norm_extend)
        elif op == "D":
            rpos += length
            edit += length
            norm += gs.norm_open + min(gs.norm_max_extend,
                                       (length - 1) * gs.norm_extend)
        elif op == "S":
            for _ in range(length):
                lp += quality.LOG_MATCH_F64[int(quals[qpos])]
                qpos += 1
    return lp, nmm, edit, norm


#: makes_sense_to_gap_align constants (GappedAligner.hh:59,75)
_HASH_K = 7
_SUFFICIENT_HITS = 8


def makes_sense_to_gap_align(q: np.ndarray, db: np.ndarray,
                             k: int = _HASH_K,
                             sufficient: int = _SUFFICIENT_HITS) -> bool:
    """Reference GappedAligner::makesSenseToGapAlign (GappedAligner.cpp:
    88-165): hash the query's k-mers to their (unique) offsets, walk the
    database window's k-mers, and accumulate votes for each implied
    query-vs-database shift.  SW can only improve the alignment when TWO
    distinct shifts each collect `sufficient` k-mer votes — i.e. the
    sequence pair shows evidence of a gap.  Vectorized numpy (sliding
    windows + bincount) instead of the reference's per-base hash loop."""
    if len(q) < k or len(db) < k:
        return False
    w = (4 ** np.arange(k - 1, -1, -1)).astype(np.int64)
    qwin = np.lib.stride_tricks.sliding_window_view(q, k)
    dwin = np.lib.stride_tricks.sliding_window_view(db, k)
    q_n = (qwin >= 4).any(axis=1)
    d_n = (dwin >= 4).any(axis=1)
    qk = (np.minimum(qwin, 3).astype(np.int64) * w).sum(axis=1)
    dk = (dwin.astype(np.int64) * w).sum(axis=1)
    # unique query offset per k-mer; repeats poison the entry (-2)
    offsets = np.full(4 ** k, -1, np.int64)
    for i in np.nonzero(~q_n)[0]:
        key = qk[i]
        offsets[key] = i if offsets[key] == -1 else -2
    qoff = offsets[dk]
    ok = (qoff >= 0) & ~d_n
    if not ok.any():
        return False
    shifts = np.nonzero(ok)[0] - qoff[ok]      # db offset - query offset
    counts = np.bincount(shifts - shifts.min())
    return int((counts >= sufficient).sum()) >= 2


def polish_gapped(index: SeedIndex, cfg: AlignConfig, res: dict,
                  bases: np.ndarray, suffix: str = "",
                  trigger: int = MISMATCHES_CUTOFF,
                  quals: np.ndarray | None = None,
                  block: int = 512, gs: GapScoring = BWA,
                  avoid_sw: bool = False) -> None:
    """Re-align triggered rows with banded SW; mutate `res` in place.

    res must carry (with `suffix`): aligned, start, reverse, mismatches,
    edit_distance, log_prob.  Adds/updates `cigar{suffix}` (list of
    per-row CIGAR strings or None for default full-M).
    """
    s = suffix
    genome = index.genome
    aligned = res["aligned" + s]
    nmm = res["mismatches" + s]
    rows = np.nonzero(aligned & (nmm > trigger))[0]
    key = "cigar" + s
    if key not in res:
        res[key] = [None] * aligned.shape[0]
    if rows.size == 0:
        return

    read_len = bases.shape[1]
    g_codes = genome.codes
    queries = []
    dbs = []
    metas = []
    for r in rows:
        if res[key][r] is not None:
            continue  # row already carries a clip cigar (masked tail)
        start = int(res["start" + s][r])
        contig = genome.contig_of(start)
        local = start - contig.offset
        fl = _flanks(local, read_len, contig.length)
        if fl is None:
            continue
        left, right = fl
        win_start = start - left
        db = g_codes[win_start : win_start + read_len + sw.BAND - 1]
        if res["reverse" + s][r]:
            q = bases[r][::-1]
            q = np.where(q < 4, 3 - q, q)
        else:
            q = bases[r]
        q = q.astype(np.int32)
        db = db.astype(np.int32)
        if avoid_sw and not makes_sense_to_gap_align(q, db):
            continue  # --avoid-smith-waterman: no gap evidence
        queries.append(q)
        dbs.append(db)
        metas.append((int(r), win_start, left))
    if not metas:
        return

    if quals is None:
        quals = np.full_like(bases, 30)

    # SMALL trigger sets run the (bit-identical) vectorized numpy DP on
    # host: one device kernel round-trip costs ~200 ms of tunnel latency
    # (round-4 profile) while the batched host DP covers ~0.4 ms/row
    # (banded_sw_numpy_batch; the per-row loop held the GIL ~5 ms/row and
    # starved the 2-core pipeline); the Pallas kernel takes over when the
    # row count amortizes the trip
    HOST_DP_MAX = 256
    for lo in range(0, len(metas), block):
        chunk = slice(lo, min(lo + block, len(metas)))
        n_chunk = chunk.stop - chunk.start
        if n_chunk <= HOST_DP_MAX:
            gfin, tb = sw.banded_sw_numpy_batch(
                np.stack(queries[chunk.start : chunk.stop]).astype(np.int32),
                np.stack(dbs[chunk.start : chunk.stop]).astype(np.int32),
                gs.sw_scores())
        else:
            # pad to the static block size: one compiled executable
            # regardless of how many rows triggered this batch
            q_arr = np.zeros((block, read_len), np.int32)
            db_arr = np.zeros((block, read_len + sw.BAND - 1), np.int32)
            q_arr[:n_chunk] = np.stack(queries[chunk.start : chunk.stop])
            db_arr[:n_chunk] = np.stack(dbs[chunk.start : chunk.stop])
            import jax
            gfin, tb = jax.device_get(
                sw.banded_sw_jit(q_arr, db_arr, gs.sw_scores()))
            gfin, tb = gfin[:n_chunk], tb[:n_chunk]
        for k, (r, win_start, left) in enumerate(metas[chunk]):
            exit_d = int(np.argmax(gfin[k]))
            ops, first_db = sw.traceback(tb[k], exit_d, read_len)
            cigar = sw.ops_to_cigar(ops)
            if all(op == "M" for _, op in cigar):
                continue  # no gap found; keep ungapped
            new_start = win_start + first_db
            rq = quals[r][::-1] if res["reverse" + s][r] else quals[r]
            seq = queries[lo + k]
            lp, nmm_g, edit_g, norm_g = rescore_cigar(
                g_codes, new_start, seq, rq, cigar, gs)
            norm_u = int(res["mismatches" + s][r]) * gs.norm_mismatch
            # FragmentBuilder acceptance: strictly better normalized score,
            # or equal score with higher log probability
            if norm_g < norm_u or (norm_g == norm_u and lp > res["log_prob" + s][r]):
                res["start" + s][r] = new_start
                res["mismatches" + s][r] = nmm_g
                res["edit_distance" + s][r] = edit_g
                res["log_prob" + s][r] = lp
                res[key][r] = cigar_to_str(cigar)
                # re-derive the mapping score with the improved best lp
                # against the (ungapped) neighborhood mass (device exports
                # it exp(-log_scale)-scaled; recover the raw f64 mass)
                if "others_sum" + s in res:
                    rog = quality.rest_of_genome_correction(
                        genome.total_length, read_len)
                    scale = float(res["log_scale" + s][r]) \
                        if "log_scale" + s in res else 0.0
                    nb = float(res["others_sum" + s][r]) * np.exp(scale) + rog
                    score = int(np.floor(-10.0 * np.log10(
                        nb / (nb + np.exp(lp)))))
                    if "mapq" + s in res:
                        res["mapq" + s][r] = min(score, cfg.mapq_cap)
                    if "frag_score" + s in res:
                        res["frag_score" + s][r] = score
