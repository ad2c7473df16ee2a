"""Independent float64 oracle of the PAIRED chain — pair resolution over
the TLS window, shadow rescue, template scoring, and the
gapped/simple-indel polish decision chain — fuzzed against the device
pipeline (VERDICT r3 missing #3: only the single-end ungapped chain had a
brute-force cross-check).

The oracle re-derives everything from first principles in float64 with
its own data structures (a python hash map from packed k-mer to genome
positions instead of the sorted searchsorted planes; full-window
offset loops instead of funnel-shifted word gathers; the numpy banded-SW
DP `sw.banded_sw_numpy` instead of the Pallas kernel):

  per-end candidates — exact 32-mer hash lookup at every seed offset,
                       fwd + revcomp, repeat suppression, contig-bound
                       rules, (orient, start) dedup + cap
  pair resolution    — f64 cross-product over both candidate lists with
                       the 8-model TLS filter (TemplateBuilder
                       locateBestPair, lib/alignment/TemplateBuilder.cpp:287),
                       template score from the summed pair mass (:435-447)
  shadow rescue      — brute-force f64 scan of every offset of the TLS
                       mate window (ShadowAligner.cpp:74-294 semantics as
                       re-designed: exhaustive window scoring)
  gapped polish      — numpy banded-SW + traceback, f64 rescore, the
                       normalized-score acceptance rule
                       (GappedAligner.cpp:167-253, FragmentBuilder update)
  simple indel       — two-anchor split-point search with prefix sums
                       (SimpleIndelAligner.cpp)

Core fields (aligned/start/reverse/mismatches/edit/cigar/shadow/
proper_pair/template_length) must match EXACTLY over >= 2048 pairs that
include rescued and gap-polished rows.  Scores (frag_score, template
score) use f32 exp/log sums on device; the tolerated divergence is a +-1
floor flip, counted and bounded.
"""

import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.align.pairs import TlsStatic
from isaac_aligner_tpu.align.pipeline import (AlignConfig, bucket_params_for,
                                              default_seed_offsets,
                                              genome_has_n_for)
from isaac_aligner_tpu.align.quality import LOG_MATCH_F64, LOG_MISMATCH_F64
from isaac_aligner_tpu.aligner import PairedAligner
from isaac_aligner_tpu.index.build import build_index
from isaac_aligner_tpu.io.fasta import genome_from_sequences
from isaac_aligner_tpu.io.fastq import ReadBatch
from isaac_aligner_tpu.ops import sw

SEED_LEN = 32
READ_LEN = 64
N_PAIRS = 2048
CONTIG = 4000            # two contigs of this many bases
PAD = 600                # keep reads this far from contig edges

TLS = TlsStatic(min=150, max=450, mate_min=150, mate_max=450,
                best0=1, best1=6, median=300)


# ---------------------------------------------------------------------------
# fixture
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(87)
    g = rng.integers(0, 4, 2 * CONTIG).astype(np.uint8)
    g[2200:2500] = g[700:1000]           # exact 300bp repeat inside contig A
    genome = genome_from_sequences([
        ("cA", dna.decode(g[:CONTIG])), ("cB", dna.decode(g[CONTIG:]))])
    index = build_index(genome, seed_len=SEED_LEN)
    assert index.has_neighbors is None or not index.has_neighbors.any()
    codes = genome.codes

    b1 = np.zeros((N_PAIRS, READ_LEN), np.uint8)
    b2 = np.zeros((N_PAIRS, READ_LEN), np.uint8)
    q1 = rng.integers(20, 41, (N_PAIRS, READ_LEN)).astype(np.uint8)
    q2 = rng.integers(20, 41, (N_PAIRS, READ_LEN)).astype(np.uint8)
    for i in range(N_PAIRS):
        co = (i % 2) * CONTIG
        p = int(rng.integers(60, CONTIG - PAD))
        tlen = int(rng.integers(170, 440))
        r1 = codes[co + p : co + p + READ_LEN].copy()
        kind = rng.random()
        if kind < 0.05:                  # junk end 1 -> shadow/rescue path
            r1 = rng.integers(0, 4, READ_LEN).astype(np.uint8)
        elif kind < 0.11:                # short indel -> banded-SW path
            d = int(rng.integers(1, 6))
            j = int(rng.integers(20, 40))
            if rng.random() < 0.5:       # deletion of d ref bases
                r1 = np.concatenate(
                    [codes[co + p : co + p + j],
                     codes[co + p + j + d : co + p + READ_LEN + d]])
            else:                        # insertion of d read bases
                r1 = np.concatenate(
                    [codes[co + p : co + p + j],
                     rng.integers(0, 4, d).astype(np.uint8),
                     codes[co + p + j : co + p + READ_LEN - d]])
        elif kind < 0.15:                # long indel -> simple-indel path
            gap = int(rng.integers(20, 80))
            j = int(rng.integers(20, 44))
            r1 = np.concatenate(
                [codes[co + p : co + p + j],
                 codes[co + p + j + gap : co + p + READ_LEN + gap]])
        else:
            n_mut = int(rng.integers(0, 9))
            for _ in range(n_mut):
                jj = int(rng.integers(0, READ_LEN))
                r1[jj] = rng.integers(0, 4)
            if rng.random() < 0.04:
                r1[rng.integers(0, READ_LEN, 3)] = 4   # read Ns
        m = codes[co + p + tlen - READ_LEN : co + p + tlen].copy()
        for _ in range(int(rng.integers(0, 4))):
            jj = int(rng.integers(0, READ_LEN))
            m[jj] = rng.integers(0, 4)
        if rng.random() < 0.02:          # both junk
            m = rng.integers(0, 4, READ_LEN).astype(np.uint8)
            r1 = rng.integers(0, 4, READ_LEN).astype(np.uint8)
        b1[i] = r1[:READ_LEN]
        b2[i] = np.where(m[::-1] < 4, 3 - m[::-1], m[::-1])
    names = [f"o{i}" for i in range(N_PAIRS)]
    batch1 = ReadBatch(names, b1, q1, np.full(N_PAIRS, READ_LEN, np.int32))
    batch2 = ReadBatch(names, b2, q2, np.full(N_PAIRS, READ_LEN, np.int32))
    return genome, index, batch1, batch2


def _cfg(index):
    bw, bl = bucket_params_for(index)
    return AlignConfig(
        seed_len=SEED_LEN, seed_offsets=default_seed_offsets(READ_LEN, SEED_LEN),
        bucket_width=bw, bucket_log2=bl,
        genome_has_n=genome_has_n_for(index),
        first_pass_seeds=0,              # oracle enumerates ALL seeds
        scored_pairs_per_read=8,
        max_scored_candidates=16)


# ---------------------------------------------------------------------------
# oracle: per-end candidates
# ---------------------------------------------------------------------------

def _kmer_table(genome, k):
    """Hash map packed-kmer -> positions (independent of the index planes)."""
    g = genome.codes
    offs = np.array([c.offset for c in genome.contigs], np.int64)
    ends = offs + np.array([c.length for c in genome.contigs], np.int64)
    table: dict[int, list[int]] = {}
    for p in range(g.shape[0] - k + 1):
        w = g[p : p + k]
        ci = int(np.searchsorted(offs, p, side="right") - 1)
        if p + k > ends[ci]:
            continue                     # k-mer straddles a contig boundary
        if (w >= 4).any():
            continue
        key = 0
        for b in w:
            key = (key << 2) | int(b)
        table.setdefault(key, []).append(p)
    return table, offs, ends


def _enumerate_end(table, offs, ends, cfg, read):
    """Candidate (orient, start) list + dodgy flag, device-dedup order."""
    k = cfg.seed_len
    fwd = read
    rc = np.where(fwd < 4, 3 - fwd, fwd)[::-1]
    min_inside = READ_LEN // 2 + 1
    max_over = READ_LEN - min_inside
    cands = set()
    for orient, seq in ((0, fwd), (1, rc)):
        for off in cfg.seed_offsets:
            if off + k > READ_LEN:
                continue
            kmer = seq[off : off + k]
            if (kmer >= 4).any():
                continue
            key = 0
            for b in kmer:
                key = (key << 2) | int(b)
            hits = table.get(key, [])
            if len(hits) > cfg.repeat_threshold:
                continue
            for p in hits:
                start = p - off
                mid = start + READ_LEN // 2
                ci = int(np.searchsorted(offs, mid, side="right") - 1)
                ci = min(max(ci, 0), len(offs) - 1)
                if not (offs[ci] <= mid < ends[ci]):
                    continue
                if start < offs[ci] - max_over or \
                        start + READ_LEN > ends[ci] + max_over:
                    continue
                if start < -max_over:
                    continue
                cands.add((orient, start, int(ci)))
    cands = sorted(cands)
    dodgy = len(cands) > cfg.max_scored_candidates
    return cands[: cfg.max_scored_candidates], dodgy


def _score_candidate(g, start, orient, read, quals, clo, chi):
    """f64 (lp, mm, edit) of the ungapped placement with contig masking."""
    seq = np.where(read < 4, 3 - read, read)[::-1] if orient else read
    qv = (quals[::-1] if orient else quals).astype(np.int64)
    gl = g.shape[0]
    j = np.arange(READ_LEN)
    gpos = start + j
    inc = (gpos >= clo) & (gpos < chi)
    ref = g[np.clip(gpos, 0, gl - 1)]
    read_n = seq >= 4
    ref_n = ref >= 4
    ne = seq != ref
    is_match = read_n | (~ne & ~ref_n)
    mm = int((~is_match & inc).sum())
    edit = int(((read_n | ref_n | ne) & inc).sum())
    lp = float(np.where(inc, np.where(is_match, LOG_MATCH_F64[qv],
                                      LOG_MISMATCH_F64[qv]), 0.0).sum())
    return lp, mm, edit


def _rog(g_len, l):
    return float(np.exp(np.log(2.0) + np.log(float(g_len))
                        - np.log(4.0) * l))


def _floor_score(nb, p_best):
    return float(np.floor(-10.0 * np.log10(nb / (nb + p_best))))


# ---------------------------------------------------------------------------
# oracle: full paired chain for one row
# ---------------------------------------------------------------------------

def _oracle_row(g, offs, ends, cfg, tls, cands, scores, quals_pair,
                reads_pair):
    """Pair resolve + scores for one row.  cands/scores per end: lists of
    (orient, start, cid) and (lp, mm, edit).  Returns the res-dict slice."""
    out = {}
    g_len = g.shape[0]
    rog_t = _rog(g_len, 2 * READ_LEN)
    s = tls.to_stats()

    matched = []
    total_prob = 0.0
    for i, (o1, p1, c1) in enumerate(cands[0]):
        for j, (o2, p2, c2) in enumerate(cands[1]):
            if c1 != c2:
                continue
            model = (0 if p1 <= p2 else 4) | (o1 << 1) | o2
            lo_first = p1 < p2
            span1 = p2 + READ_LEN - p1
            span2 = p1 + READ_LEN - p2
            length = max(span1, READ_LEN) if lo_first else max(span2, READ_LEN)
            if model not in (tls.best0, tls.best1):
                continue
            if length > tls.max + 50_000:
                continue
            pair_lp = scores[0][i][0] + scores[1][j][0]
            pair_mm = scores[0][i][1] + scores[1][j][1]
            total_prob += np.exp(pair_lp)
            matched.append((pair_mm * 1e5 - pair_lp, i, j, model, length,
                            pair_lp))
    resolved = bool(matched)
    out["pair_resolved"] = resolved
    if resolved:
        key, bi, bj, model, length, best_lp = min(
            matched, key=lambda t: (t[0], t[1], t[2]))
        out["proper_pair"] = (model in (tls.best0, tls.best1)
                              and tls.min <= length <= tls.max)
        out["template_length"] = length
        nb = max(total_prob - np.exp(best_lp), 0.0) + rog_t
        out["template_score"] = min(
            max(_floor_score(nb, np.exp(best_lp)), -1), cfg.mapq_cap)
        idx = (bi, bj)
    else:
        out["proper_pair"] = False
        out["template_length"] = 0
        out["template_score"] = -1
        idx = []
        for e in (0, 1):
            if cands[e]:
                keys = [sc[1] * 1e5 - sc[0] for sc in scores[e]]
                idx.append(int(np.argmin(keys)))
            else:
                idx.append(0)
        idx = tuple(idx)

    for e in (0, 1):
        sfx = f"_{e + 1}"
        aligned = bool(cands[e])
        out["aligned" + sfx] = aligned
        if not aligned:
            out["start" + sfx] = -1
            out["frag_score" + sfx] = 0
            continue
        o, p, _c = cands[e][idx[e]]
        lp, mm, edit = scores[e][idx[e]]
        out["start" + sfx] = p
        out["reverse" + sfx] = o == 1
        out["mismatches" + sfx] = mm
        out["edit_distance" + sfx] = edit
        out["log_prob" + sfx] = lp
        probs = sum(np.exp(sc[0]) for sc in scores[e])
        others = max(probs - np.exp(lp), 0.0)
        out["others_sum" + sfx] = others
        nb = others + _rog(g_len, READ_LEN)
        out["frag_score" + sfx] = min(max(_floor_score(nb, np.exp(lp)), 0),
                                      cfg.mapq_cap)
    out["shadow_1"] = out["aligned_2"] and not out["aligned_1"]
    out["shadow_2"] = out["aligned_1"] and not out["aligned_2"]
    return out


def _scan_window(g, cfg, tls, out, orphan_end, reads_pair, quals_pair,
                 window):
    """One brute-force f64 TLS-window scan anchored at `orphan_end`'s
    current placement, rescuing the other end.  Returns None (no found)
    or a dict of best-offset results."""
    s = tls.to_stats()
    g_len = g.shape[0]
    shadow_end = 3 - orphan_end
    o_start = out[f"start_{orphan_end}"]
    o_rev = out[f"reverse_{orphan_end}"]
    ri = orphan_end - 1
    mn = s.mate_min_position(ri, o_rev, 0, (READ_LEN, READ_LEN))
    mx = s.mate_max_position(ri, o_rev, 0, (READ_LEN, READ_LEN))
    srev = s.mate_orientation(ri, o_rev)
    win_start = o_start + mn
    win_end = o_start + mx
    shadow = reads_pair[shadow_end - 1]
    qv = quals_pair[shadow_end - 1].astype(np.int64)
    seq = np.where(shadow < 4, 3 - shadow, shadow)[::-1] if srev else shadow
    q = qv[::-1] if srev else qv
    lps = np.full(window, -np.inf)
    mms = np.zeros(window, np.int64)
    edits = np.zeros(window, np.int64)
    ok = np.zeros(window, bool)
    for w in range(window):
        start = win_start + w
        if start < 0 or start + READ_LEN > g_len or start > win_end:
            continue
        ok[w] = True
        ref = g[start : start + READ_LEN]
        read_n = seq >= 4
        ref_n = ref >= 4
        ne = seq != ref
        is_match = read_n | (~ne & ~ref_n)
        mms[w] = int((~is_match).sum())
        edits[w] = int((read_n | ref_n | ne).sum())
        lps[w] = float(np.where(is_match, LOG_MATCH_F64[q],
                                LOG_MISMATCH_F64[q]).sum())
    if not ok.any():
        return None
    key = np.where(ok, mms * 1e5 - lps, np.inf)
    w = int(np.argmin(key))
    max_mm = int(READ_LEN * cfg.rescue_max_mismatch_frac)
    if mms[w] > max_mm:
        return None
    nb = max(np.exp(lps[ok]).sum() - np.exp(lps[w]), 0.0) \
        + _rog(g_len, 2 * READ_LEN)
    score = int(min(max(_floor_score(nb, np.exp(lps[w])), 0), cfg.mapq_cap))
    return {"start": win_start + w, "reverse": bool(srev),
            "mismatches": int(mms[w]), "edit_distance": int(edits[w]),
            "log_prob": float(lps[w]), "score": score}


def _merge_rescued(out, tls, shadow_end, best):
    sfx = f"_{shadow_end}"
    out["aligned" + sfx] = True
    out["start" + sfx] = best["start"]
    out["reverse" + sfx] = best["reverse"]
    out["mismatches" + sfx] = best["mismatches"]
    out["edit_distance" + sfx] = best["edit_distance"]
    out["log_prob" + sfx] = best["log_prob"]
    out["shadow" + sfx] = False
    out["rescued" + sfx] = True
    out["frag_score" + sfx] = best["score"]
    out["template_score"] = best["score"]
    p1, p2 = out["start_1"], out["start_2"]
    r1, r2 = out["reverse_1"], out["reverse_2"]
    model = (0 if p1 <= p2 else 4) | (int(r1) << 1) | int(r2)
    lo_first = p1 < p2
    length = max(p2 + READ_LEN - p1, READ_LEN) if lo_first else \
        max(p1 + READ_LEN - p2, READ_LEN)
    out["pair_resolved"] = True
    out["proper_pair"] = (model in (tls.best0, tls.best1)
                          and tls.min <= length <= tls.max)
    out["template_length"] = int(length)


def _oracle_rescue(g, cfg, tls, out, reads_pair, quals_pair, window):
    """Shadow + disjoined rescue for one row (f64 window scans)."""
    for shadow_end, orphan_end in ((1, 2), (2, 1)):
        if not out.get(f"shadow_{shadow_end}"):
            continue
        best = _scan_window(g, cfg, tls, out, orphan_end, reads_pair,
                            quals_pair, window)
        if best is not None:
            _merge_rescued(out, tls, shadow_end, best)
    # disjoined: both ends aligned, no TLS pair — rescue anchored at each
    # end, best (summed mm, then summed lp) template wins, dir 1 on ties
    # (buildDisjoinedTemplate, TemplateBuilder.cpp:716-866)
    if out["aligned_1"] and out["aligned_2"] and not out["pair_resolved"]:
        cands = {}
        for orphan_end in (1, 2):
            best = _scan_window(g, cfg, tls, out, orphan_end, reads_pair,
                                quals_pair, window)
            if best is None:
                continue
            key = (out[f"mismatches_{orphan_end}"] + best["mismatches"]) \
                * 1e5 - (out[f"log_prob_{orphan_end}"] + best["log_prob"])
            cands[orphan_end] = (key, best)
        if cands:
            win_oe = min(cands, key=lambda oe: (cands[oe][0], oe))
            _merge_rescued(out, tls, 3 - win_oe, cands[win_oe][1])


def _rescore_f64(g, start, seq, quals, cigar, gs):
    """Independent f64 rescore of an explicit CIGAR (genome-level)."""
    lp = 0.0
    nmm = edit = norm = 0
    qpos = 0
    rpos = int(start)
    for length, op in cigar:
        if op == "M":
            for _ in range(length):
                sv, rv, qv = int(seq[qpos]), int(g[rpos]), int(quals[qpos])
                is_match = (sv == 4) or (sv == rv and rv != 4)
                if is_match:
                    lp += LOG_MATCH_F64[qv]
                else:
                    lp += LOG_MISMATCH_F64[qv]
                    nmm += 1
                    norm += gs.norm_mismatch
                if sv != rv or sv == 4:
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
    return lp, nmm, edit, norm


def _oracle_gapped(g, genome, cfg, gs, out, read, quals, sfx):
    """Numpy banded-SW + acceptance rule for one row/end (polish chain)."""
    if not out.get("aligned" + sfx) or out["mismatches" + sfx] <= 5:
        return
    if out.get("cigar" + sfx):
        return
    start = out["start" + sfx]
    contig = genome.contig_of(start)
    local = start - contig.offset
    total = sw.BAND - 1
    left = min(7, local)
    right = total - left
    if local + READ_LEN + right > contig.length:
        right = contig.length - local - READ_LEN
        left = total - right
        if right < 0 or left > local:
            return
    win_start = start - left
    db = g[win_start : win_start + READ_LEN + sw.BAND - 1].astype(np.int32)
    if out["reverse" + sfx]:
        q = np.where(read < 4, 3 - read, read)[::-1]
        rq = quals[::-1]
    else:
        q = read
        rq = quals
    gfin, tb = sw.banded_sw_numpy(q.astype(np.int32), db, gs.sw_scores())
    exit_d = int(np.argmax(gfin))
    ops, first_db = sw.traceback(tb, exit_d, READ_LEN)
    cigar = sw.ops_to_cigar(ops)
    if all(op == "M" for _, op in cigar):
        return
    new_start = win_start + first_db
    lp, nmm_g, edit_g, norm_g = _rescore_f64(g, new_start, q, rq, cigar, gs)
    norm_u = out["mismatches" + sfx] * gs.norm_mismatch
    if norm_g < norm_u or (norm_g == norm_u and lp > out["log_prob" + sfx]):
        out["start" + sfx] = new_start
        out["mismatches" + sfx] = nmm_g
        out["edit_distance" + sfx] = edit_g
        out["log_prob" + sfx] = lp
        out["cigar" + sfx] = "".join(f"{n}{op}" for n, op in cigar)
        nb = out["others_sum" + sfx] + _rog(g.shape[0], READ_LEN) \
            if "others_sum" + sfx in out else _rog(g.shape[0], READ_LEN)
        out["frag_score" + sfx] = min(
            int(_floor_score(nb, np.exp(lp))), cfg.mapq_cap)


def _oracle_indel(g, cfg, gs, out, cands, read, quals, sfx):
    """Two-anchor long-indel split search (polish_simple_indels chain)."""
    if not out.get("aligned" + sfx) or out["mismatches" + sfx] <= 6:
        return
    cigar0 = out.get("cigar" + sfx)
    if cigar0 and "S" in cigar0:
        return
    if len(cands) < 2:
        return
    cur_norm = out["mismatches" + sfx] * gs.norm_mismatch
    if cigar0:
        import re
        parsed = [(int(n), op) for n, op in re.findall(r"(\d+)([MIDS])", cigar0)]
        for length, op in parsed:
            if op in ("I", "D"):
                cur_norm += gs.norm_open + min(gs.norm_max_extend,
                                               (length - 1) * gs.norm_extend)
    best_choice = None
    MIN_FLANK, MAX_GAP = 16, 100
    for oi in (0, 1):
        cl = [p for (o, p, _c) in cands if o == oi]
        if len(cl) < 2:
            continue
        seq = np.where(read < 4, 3 - read, read)[::-1] if oi else read

        def prof(st):
            if st < 0 or st + READ_LEN > g.shape[0]:
                return np.ones(READ_LEN, bool)
            ref = g[st : st + READ_LEN]
            return ~((seq == 4) | ((seq == ref) & (ref != 4)))

        profs = {}
        for a in range(len(cl)):
            for b in range(len(cl)):
                s1, s2 = cl[a], cl[b]
                gap = s2 - s1
                if gap == 0 or abs(gap) > MAX_GAP:
                    continue
                if s1 not in profs:
                    profs[s1] = prof(s1)
                if s2 not in profs:
                    profs[s2] = prof(s2)
                mm1, mm2 = profs[s1], profs[s2]
                if gap > 0:
                    pre = np.concatenate([[0], np.cumsum(mm1)])
                    suf = np.concatenate([np.cumsum(mm2[::-1])[::-1], [0]])
                    j_lo, j_hi = MIN_FLANK, READ_LEN - MIN_FLANK
                    if j_lo >= j_hi:
                        continue
                    tot = pre[j_lo:j_hi] + suf[j_lo:j_hi]
                    j = j_lo + int(np.argmin(tot))
                    nmm = int(tot[j - j_lo])
                    cigar = f"{j}M{gap}D{READ_LEN - j}M"
                    glen = gap
                else:
                    ins = -gap
                    pre = np.concatenate([[0], np.cumsum(mm1)])
                    suf = np.concatenate([np.cumsum(mm2[::-1])[::-1], [0]])
                    j_lo = MIN_FLANK
                    j_hi = READ_LEN - ins - MIN_FLANK
                    if j_lo >= j_hi:
                        continue
                    tot = pre[j_lo:j_hi] + suf[j_lo + ins : j_hi + ins]
                    j = j_lo + int(np.argmin(tot))
                    nmm = int(tot[j - j_lo])
                    cigar = f"{j}M{ins}I{READ_LEN - j - ins}M"
                    glen = ins
                norm = nmm * gs.norm_mismatch + gs.norm_open + \
                    min(gs.norm_max_extend, (glen - 1) * gs.norm_extend)
                if norm < cur_norm and (best_choice is None
                                        or norm < best_choice[0]):
                    best_choice = (norm, cigar, s1, oi)
    if best_choice is None:
        return
    _n, cigar_str, pos, oi = best_choice
    import re
    parsed = [(int(n), op) for n, op in re.findall(r"(\d+)([MID])", cigar_str)]
    seq = np.where(read < 4, 3 - read, read)[::-1] if oi else read
    rq = quals[::-1] if oi else quals
    lp, nmm_g, edit_g, _ = _rescore_f64(g, pos, seq, rq, parsed, gs)
    out["start" + sfx] = pos
    out["reverse" + sfx] = bool(oi)
    out["mismatches" + sfx] = nmm_g
    out["edit_distance" + sfx] = edit_g
    out["log_prob" + sfx] = lp
    out["cigar" + sfx] = cigar_str
    if "others_sum" + sfx in out:
        nb = out["others_sum" + sfx] + _rog(g.shape[0], READ_LEN)
        out["frag_score" + sfx] = min(int(_floor_score(nb, np.exp(lp))),
                                      cfg.mapq_cap)


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

def test_device_paired_chain_matches_f64_oracle(fixture):
    genome, index, batch1, batch2 = fixture
    cfg = _cfg(index)
    al = PairedAligner.create(index, read_len=READ_LEN, cfg=cfg,
                              base_quality_cutoff=0, clip_semialigned=False,
                              clip_overlapping=False)
    al.tls = TLS
    res = al.align_batch_arrays(batch1, batch2)
    window = al._rescue_window()

    g = genome.codes.astype(np.int16)
    table, offs, ends = _kmer_table(genome, SEED_LEN)
    gs = al.gap_scoring

    n_score_flips = 0
    n_scored = 0
    mismatch_fields = []
    rescued_rows = 0
    gapped_rows = 0
    for i in range(N_PAIRS):
        reads_pair = (batch1.bases[i], batch2.bases[i])
        quals_pair = (batch1.quals[i], batch2.quals[i])
        cands = []
        scores = []
        for e in (0, 1):
            cl, dodgy = _enumerate_end(table, offs, ends, cfg, reads_pair[e])
            assert not dodgy, f"row {i}: fixture should not overflow the cap"
            cands.append(cl)
            scores.append([
                _score_candidate(g, p, o, reads_pair[e], quals_pair[e],
                                 int(offs[c]), int(ends[c]))
                for (o, p, c) in cl])
        want = _oracle_row(g, offs, ends, cfg, TLS, cands, scores,
                           quals_pair, reads_pair)
        _oracle_rescue(g, cfg, TLS, want, reads_pair, quals_pair, window)
        for e in (0, 1):
            sfx = f"_{e + 1}"
            _oracle_gapped(g, genome, cfg, gs, want, reads_pair[e],
                           quals_pair[e], sfx)
            # rescued rows have no candidate grid on the device
            icands = [] if want.get("rescued" + sfx) else cands[e]
            _oracle_indel(g, cfg, gs, want, icands, reads_pair[e],
                          quals_pair[e], sfx)
        rescued_rows += int(bool(want.get("rescued_1") or want.get("rescued_2")))
        gapped_rows += int(bool(want.get("cigar_1") or want.get("cigar_2")))

        # ---- compare against the device row --------------------------------
        def dev(k):
            v = res[k]
            return v[i] if not isinstance(v, list) else v[i]

        for k in ("pair_resolved", "proper_pair", "shadow_1", "shadow_2"):
            if bool(dev(k)) != bool(want[k]):
                mismatch_fields.append((i, k, bool(dev(k)), bool(want[k])))
        if int(dev("template_length")) != int(want["template_length"]):
            mismatch_fields.append((i, "template_length",
                                    int(dev("template_length")),
                                    int(want["template_length"])))
        for e in (1, 2):
            sfx = f"_{e}"
            if bool(dev("aligned" + sfx)) != bool(want["aligned" + sfx]):
                mismatch_fields.append((i, "aligned" + sfx,
                                        bool(dev("aligned" + sfx)),
                                        bool(want["aligned" + sfx])))
                continue
            if not want["aligned" + sfx]:
                continue
            for f in ("start", "reverse", "mismatches", "edit_distance"):
                if int(dev(f + sfx)) != int(want[f + sfx]):
                    mismatch_fields.append((i, f + sfx, int(dev(f + sfx)),
                                            int(want[f + sfx])))
            got_c = res.get("cigar" + sfx)
            got_c = got_c[i] if got_c else None
            if (got_c or None) != (want.get("cigar" + sfx) or None):
                mismatch_fields.append((i, "cigar" + sfx, got_c,
                                        want.get("cigar" + sfx)))
            n_scored += 1
            # frag_score is uncapped in the result dict (record conversion
            # caps it, build/storage.py:210) — compare capped
            dv = min(int(dev("frag_score" + sfx)), cfg.mapq_cap)
            d = abs(dv - int(want["frag_score" + sfx]))
            if d:
                n_score_flips += 1
                assert d <= 1, (i, "frag_score" + sfx, dv,
                                want["frag_score" + sfx])
        d = abs(int(dev("template_score")) - int(want["template_score"]))
        if d:
            n_score_flips += 1
            assert d <= 1, (i, "template_score", int(dev("template_score")),
                            want["template_score"])

    assert not mismatch_fields, \
        f"{len(mismatch_fields)} core-field mismatches, first 10: " \
        f"{mismatch_fields[:10]}"
    # the fixture must actually exercise the hard paths
    assert rescued_rows >= 30, rescued_rows
    assert gapped_rows >= 60, gapped_rows
    assert n_score_flips <= max(4, int(0.01 * n_scored)), \
        f"{n_score_flips}/{n_scored} score floor flips"
    print(f"\n[oracle-paired] score floor-flip rate: "
          f"{n_score_flips}/{n_scored} "
          f"({100.0 * n_score_flips / max(n_scored, 1):.3f}%)")
