"""Banded Smith-Waterman: Pallas TPU kernel + numpy oracle.

Reference analog: the SSE2 BandedSmithWaterman
(src/c++/include/alignment/BandedSmithWaterman.hh:50-108,
 src/c++/lib/alignment/BandedSmithWaterman.cpp) — an ELAND-derived
affine-gap aligner over a BAND of 16 diagonals: the query (read) is fully
consumed, the database window is query_len + 15 reference bases, and the
leading/trailing window offset is free (folded into the alignment start
position, GappedAligner.cpp:180-250).

TPU-native design (NOT a SIMD translation):
- PAIRS are the vector axis: the kernel scores a block of 128 (query,
  window) pairs per grid step, holding the 16-wide band on the sublane
  axis — every VPU lane is busy on a different alignment, the classic
  batched-wavefront layout.
- The in-row E recurrence (gap in the query consuming database bases,
  E[d] = max(A[d-1], E[d-1]+extend)) is solved with a log-depth prefix-max
  scan over the band axis instead of the reference's 16-step scalar loop.
- Traceback matrices (2 bits per state, 3 states) are packed into one
  int32 plane [L, 16, P] and written to HBM; the walk itself is cheap
  and runs vectorized on the host (align/gapped.py).

Band coordinates: cell (i, d) aligns query base i against database
position i + d, d in [0, 16).  Recurrences:
  G[i,d] = max(G,E,F)[i-1,d] + W(q_i, db_{i+d})        (diagonal)
  F[i,d] = max(G[i-1,d+1]-open, E[i-1,d+1]-open, F[i-1,d+1]-extend)
           (insertion: query base consumed, database not)
  E[i,d] = max(G[i,d-1]-open, F[i,d-1]-open, E[i,d-1]-extend)
           (deletion: database base consumed, query not)
Row 0 enters free at any d (G[0,d] = W[0,d]).  Final score =
max_d G[L-1,d]; the exit/entry offsets give the position adjustment.
State preference on ties is G > E > F, matching the reference's
comparison order (BandedSmithWaterman.cpp:140-190).

ROOFLINE (BASELINE.md "banded SW at per-chip roofline").  The kernel is
VPU-COMPUTE-bound, not HBM-bound:

* HBM traffic per cell: inputs are 4+4 bytes of int32 codes per
  (pair, row) amortized over 16 band cells (~0.5 B/cell) and the packed
  traceback write is one int32 per TB_PACK=5 rows x 16 lanes
  (4/5 B/cell) — ~1.3 B/cell total.  At v5e's ~819 GB/s that bounds
  ~630 GCUPS, an order of magnitude above what compute allows; fusing
  further or int8 scores would NOT raise the ceiling.
* VPU issue per cell (counted from row_math): substitution select (2),
  G 3-max + tie selects (~7), F shift+3-max+selects (~12), the E
  prefix-max scan log2(16)=4 steps of roll+add+max+mask (~20), tb
  encode/pack (~4) => ~45 f32 lane-ops/cell.  TPU VPUs are 32-bit
  lanes ((8,128) x 4 ALUs x ~0.94 GHz => ~3.9e12 lane-op/s/chip), so
  the issue bound is ~85 GCUPS/chip; int16 scores would NOT double it
  (no double-rate int16 lanes on the VPU, unlike the reference's SSE2
  epi16 path which packs 8 lanes/xmm, BandedSmithWaterman.cpp).
* Measured (bench.py sw_gcups section, chained-slope methodology):
  67-82 GCUPS across runs (81.6 in the round-4 bench) => up to ~0.96x
  of the issue bound.  The residual gap is Mosaic scheduling of the
  cross-sublane rolls (every shift_down/up is a real shuffle op) —
  already minimized by keeping the band on the sublane axis and pairs
  on lanes.
* Context: the reference's SSE2 kernel retires ~1 cell/cycle/core in
  the best case (~3 GCUPS on a 24-core node); one v5e chip at 70 GCUPS
  is ~23x a full reference node on this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 16
NEG = -1.0e9
#: query rows packed per traceback word (6 bits of state codes per row)
TB_PACK = 5

# default scores: the reference's default --gap-scoring "bwa" preset
# 0:-3:-11:-4:-20 (AlignOptions.cpp:55,124)
BWA_SCORES = (0.0, -3.0, -11.0, -4.0)       # match, mismatch, open, extend
ELAND_SCORES = (2.0, -1.0, -15.0, -3.0)


def _sw_body(scores, unroll, q_ref, db_ref, gfin_ref, tb_ref):
    """Banded affine-gap DP with in-kernel substitution scoring.

    q_ref: [L, P] int32 query codes; db_ref: [L+BAND-1, P] int32 window
    codes.  Row i compares q_ref[i] (sublane-broadcast) against the
    db_ref[i : i+BAND] block — 8 bytes/pair/row of VMEM traffic instead
    of the 64 bytes/pair/row a precomputed f32 weight plane costs.  The
    compiled path fully unrolls the row loop in Python, so every slice
    offset is STATIC (round-1's "dynamic row slices force a Mosaic
    relayout per row" problem only bites dynamic offsets).

    Traceback is PACKED: the 6-bit state code of TB_PACK consecutive
    query rows shares one int32 word (tb_ref row group (i // TB_PACK) *
    BAND), cutting traceback HBM writes + host fetches 5x vs the naive
    one-word-per-cell plane (VERDICT r1: int32 plane with 6 live bits).
    """
    match_s, mismatch_s, open_s, extend_s = scores
    l, p = q_ref.shape

    def _shift_down(x, fill, k=1):
        """out[d] = x[d-k] along the band (sublane) axis; out[:k] = fill."""
        rolled = pltpu.roll(x, k, axis=0)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(idx < k, fill, rolled)

    def _shift_up(x, fill):
        """out[d] = x[d+1]; out[BAND-1] = fill (circular roll by BAND-1)."""
        rolled = pltpu.roll(x, x.shape[0] - 1, axis=0)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(idx == x.shape[0] - 1, fill, rolled)

    d_idx = jax.lax.broadcasted_iota(jnp.int32, (BAND, p), 0)
    ext_ramp = d_idx.astype(jnp.float32) * jnp.float32(extend_s)

    def row_math(w, carry):
        g_prev, e_prev, f_prev = carry

        # diagonal: predecessor state max with G>E>F tie preference
        m_prev = jnp.maximum(jnp.maximum(g_prev, e_prev), f_prev)
        tg = jnp.where(e_prev > jnp.maximum(g_prev, f_prev), 1,
                       jnp.where(f_prev > g_prev, 2, 0))
        new_g = m_prev + w

        # F: from row i-1, band d+1
        g_up = _shift_up(g_prev, NEG)
        e_up = _shift_up(e_prev, NEG)
        f_up = _shift_up(f_prev, NEG)
        from_g = g_up + jnp.float32(open_s)
        from_e = e_up + jnp.float32(open_s)
        from_f = f_up + jnp.float32(extend_s)
        new_f = jnp.maximum(jnp.maximum(from_g, from_e), from_f)
        tf = jnp.where(from_e > jnp.maximum(from_g, from_f), 1,
                       jnp.where(from_f > from_g, 2, 0))

        # E: in-row prefix-max scan over d
        a_g = new_g + jnp.float32(open_s)
        a_f = new_f + jnp.float32(open_s)
        a = jnp.maximum(a_g, a_f)
        t = a - ext_ramp                                  # A[k] - k*ext
        pm = t
        for s in (1, 2, 4, 8):
            pm = jnp.maximum(pm, _shift_down(pm, NEG, k=s))  # prefix max over k<=d
        # E[d] = P[d-1] + (d-1)*ext
        pm_dm1 = _shift_down(pm, NEG)
        new_e = pm_dm1 + (d_idx - 1).astype(jnp.float32) * jnp.float32(extend_s)
        new_e = jnp.maximum(new_e, NEG)                   # clamp -inf drift
        # TE from the direct one-step recurrence (equivalent to the scan)
        from_e2 = _shift_down(new_e, NEG) + jnp.float32(extend_s)
        a_g_dm1 = _shift_down(a_g, NEG)
        a_f_dm1 = _shift_down(a_f, NEG)
        te = jnp.where(from_e2 > jnp.maximum(a_g_dm1, a_f_dm1), 1,
                       jnp.where(a_f_dm1 > a_g_dm1, 2, 0))

        return (new_g, new_e, new_f), tg + te * 4 + tf * 16

    # row-0 entry: free start at any band offset => diagonal predecessor 0
    g0 = jnp.zeros((BAND, p), jnp.float32)
    e0 = jnp.full((BAND, p), NEG, jnp.float32)
    f0 = jnp.full((BAND, p), NEG, jnp.float32)

    def sub_w(q_row, db_block):
        """W(q_i, db_{i+d}) for one query row against its 16-row window."""
        qb = jnp.broadcast_to(q_row, (BAND, p))
        return jnp.where((db_block == qb) & (qb < 4),
                         jnp.float32(match_s), jnp.float32(mismatch_s))

    if unroll:
        # compiled path: Python loop => static offsets everywhere; Mosaic
        # software-pipelines the per-group packed tb stores
        carry = (g0, e0, f0)
        acc = jnp.zeros((BAND, p), jnp.int32)
        for i in range(l):
            w = sub_w(q_ref[pl.ds(i, 1), :], db_ref[pl.ds(i, BAND), :])
            carry, code = row_math(w, carry)
            acc = acc | (code << (6 * (i % TB_PACK)))
            if i % TB_PACK == TB_PACK - 1 or i == l - 1:
                tb_ref[pl.ds((i // TB_PACK) * BAND, BAND), :] = acc
                acc = jnp.zeros((BAND, p), jnp.int32)
        g = carry[0]
    else:
        # interpret path stays rolled (unrolled tracing is ~100x slower)
        def row(i, state):
            carry, acc = state
            w = sub_w(q_ref[pl.ds(i, 1), :], db_ref[pl.ds(i, BAND), :])
            carry, code = row_math(w, carry)
            acc = acc | (code << (6 * (i % TB_PACK)))
            store = ((i % TB_PACK) == TB_PACK - 1) | (i == l - 1)

            @pl.when(store)
            def _():
                tb_ref[pl.ds((i // TB_PACK) * BAND, BAND), :] = acc

            acc = jnp.where(store, 0, acc)
            return carry, acc

        (g, _e, _f), _acc = jax.lax.fori_loop(
            0, l, row, ((g0, e0, f0), jnp.zeros((BAND, p), jnp.int32)))
    gfin_ref[:, :] = g


def banded_sw(query: jax.Array, db: jax.Array,
              scores: tuple[float, float, float, float] = BWA_SCORES,
              interpret: bool | None = None, block: int = 128):
    """Score a batch of banded alignments.

    Args:
      query: int32/uint8 [N, L] read codes (0..4).
      db:    int32/uint8 [N, L + BAND - 1] reference window codes.
      scores: (match, mismatch, gap_open, gap_extend), all "reward" signed.
      interpret: force Pallas interpret mode (defaults to auto: compiled
        on TPU, interpreted elsewhere).

    Returns:
      final_g: float32 [N, BAND] last-row G scores (alignment must end at
        query row L-1, band offset d; best = argmax).
      tb: int32 [N, ceil(L/TB_PACK), BAND] PACKED traceback codes — the
        6-bit code (TG + 4*TE + 16*TF, each 0=G 1=E 2=F) of query row i
        lives at word i // TB_PACK, bit offset 6 * (i % TB_PACK).
        Unpack with `unpack_tb`.
    """
    n, l = query.shape
    assert db.shape == (n, l + BAND - 1), (query.shape, db.shape)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    groups = -(-l // TB_PACK)

    n_pad = -(-n // block) * block
    qT = jnp.zeros((l, n_pad), jnp.int32).at[:, :n].set(query.T.astype(jnp.int32))
    # pad db with sentinel 5 (never matches)
    dbT = jnp.full((l + BAND - 1, n_pad), 5, jnp.int32).at[:, :n].set(
        db.T.astype(jnp.int32))
    grid = (n_pad // block,)

    gfin, tb = pl.pallas_call(
        functools.partial(_sw_body, scores, not interpret),
        out_shape=(
            jax.ShapeDtypeStruct((BAND, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((groups * BAND, n_pad), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((l, block), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l + BAND - 1, block), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BAND, block), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups * BAND, block), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qT, dbT)

    tb3 = tb.reshape(groups, BAND, n_pad)
    return gfin.T[:n], jnp.transpose(tb3, (2, 0, 1))[:n]


@functools.partial(jax.jit, static_argnames=("scores", "interpret", "block"))
def banded_sw_jit(query, db, scores=BWA_SCORES, interpret=None, block=256):
    """Jitted banded_sw — ALWAYS prefer this entry point: the padding and
    layout transposes around the kernel otherwise dispatch as eager ops,
    which is pathologically slow on the tunneled TPU backend."""
    return banded_sw(query, db, scores=scores, interpret=interpret,
                     block=block)


def unpack_tb(tb_packed: np.ndarray, l: int) -> np.ndarray:
    """Packed [.., ceil(L/TB_PACK), BAND] traceback words -> per-row 6-bit
    codes [.., L, BAND] (vectorized host unpack)."""
    tb_packed = np.asarray(tb_packed)
    rows = np.arange(l)
    words = tb_packed[..., rows // TB_PACK, :]
    shifts = (6 * (rows % TB_PACK))[..., :, None]
    return (words >> shifts) & 63


# ---------------------------------------------------------------------------
# numpy oracle (direct transcription of the recurrences; test-only)
# ---------------------------------------------------------------------------

def pack_tb(tb_rows: np.ndarray) -> np.ndarray:
    """Per-row codes [L, BAND] -> packed words [ceil(L/TB_PACK), BAND]."""
    l, band = tb_rows.shape
    groups = -(-l // TB_PACK)
    out = np.zeros((groups, band), np.int32)
    for i in range(l):
        out[i // TB_PACK] |= tb_rows[i] << (6 * (i % TB_PACK))
    return out


def banded_sw_numpy(query: np.ndarray, db: np.ndarray,
                    scores=BWA_SCORES):
    """Single-pair oracle returning (final_g [BAND],
    tb [ceil(L/TB_PACK), BAND] packed like the kernel's).

    float32 like the kernel so sentinel-region tie-breaks agree exactly
    (at -1e9, f32 swallows the gap-score differences; those cells are
    unreachable by any real traceback either way).
    """
    match_s, mismatch_s, open_s, extend_s = (np.float32(s) for s in scores)
    l = query.shape[0]
    g = np.zeros(BAND, np.float32)
    e = np.full(BAND, NEG, np.float32)
    f = np.full(BAND, NEG, np.float32)
    tb = np.zeros((l, BAND), np.int32)
    for i in range(l):
        w = np.array([match_s if (query[i] == db[i + d] and query[i] < 4)
                      else mismatch_s for d in range(BAND)], np.float32)
        m_prev = np.maximum(np.maximum(g, e), f)
        tg = np.where(e > np.maximum(g, f), 1, np.where(f > g, 2, 0))
        new_g = m_prev + w
        up = lambda x: np.concatenate([x[1:], [np.float32(NEG)]]).astype(np.float32)
        fg, fe, ff = up(g) + open_s, up(e) + open_s, up(f) + extend_s
        new_f = np.maximum(np.maximum(fg, fe), ff)
        tf = np.where(fe > np.maximum(fg, ff), 1, np.where(ff > fg, 2, 0))
        new_e = np.full(BAND, NEG, np.float32)
        te = np.zeros(BAND, np.int32)
        for d in range(1, BAND):
            fg2 = new_g[d - 1] + open_s
            ff2 = new_f[d - 1] + open_s
            fe2 = new_e[d - 1] + extend_s
            new_e[d] = max(fg2, ff2, fe2)
            te[d] = 1 if fe2 > max(fg2, ff2) else (2 if ff2 > fg2 else 0)
        tb[i] = tg + te * 4 + tf * 16
        g, e, f = new_g, new_e, new_f
    return g, pack_tb(tb)


def banded_sw_numpy_batch(queries: np.ndarray, dbs: np.ndarray,
                          scores=BWA_SCORES):
    """Vectorized host DP over a batch of pairs: queries [N, L] int,
    dbs [N, L+BAND-1] int -> (g [N, BAND], tb [N, ceil(L/TB_PACK), BAND]).

    Bit-identical to `banded_sw_numpy` row by row (all elementwise f32
    ops; no accumulation-order hazards), but loops only over L x BAND
    with [N]-vector numpy ops — the per-row Python version costs ~5 ms
    of GIL-held loop per pair, which starved the 2-core e2e pipeline
    when the gapped polish ran on finish workers (round-5 profile)."""
    match_s, mismatch_s, open_s, extend_s = (np.float32(s) for s in scores)
    neg = np.float32(NEG)
    n, l = queries.shape
    g = np.zeros((n, BAND), np.float32)
    e = np.full((n, BAND), neg, np.float32)
    f = np.full((n, BAND), neg, np.float32)
    tb = np.zeros((n, l, BAND), np.int32)
    up_fill = np.full((n, 1), neg, np.float32)

    def up(x):
        return np.concatenate([x[:, 1:], up_fill], axis=1)

    for i in range(l):
        q_i = queries[:, i : i + 1]
        w = np.where((q_i == dbs[:, i : i + BAND]) & (q_i < 4),
                     match_s, mismatch_s)
        m_prev = np.maximum(np.maximum(g, e), f)
        tg = np.where(e > np.maximum(g, f), 1, np.where(f > g, 2, 0))
        new_g = m_prev + w
        fg, fe, ff = up(g) + open_s, up(e) + open_s, up(f) + extend_s
        new_f = np.maximum(np.maximum(fg, fe), ff)
        tf = np.where(fe > np.maximum(fg, ff), 1, np.where(ff > fg, 2, 0))
        new_e = np.full((n, BAND), neg, np.float32)
        te = np.zeros((n, BAND), np.int32)
        for d in range(1, BAND):
            fg2 = new_g[:, d - 1] + open_s
            ff2 = new_f[:, d - 1] + open_s
            fe2 = new_e[:, d - 1] + extend_s
            new_e[:, d] = np.maximum(np.maximum(fg2, ff2), fe2)
            te[:, d] = np.where(fe2 > np.maximum(fg2, ff2), 1,
                                np.where(ff2 > fg2, 2, 0))
        tb[:, i] = tg + te * 4 + tf * 16
        g, e, f = new_g, new_e, new_f

    # pack TB_PACK query rows per int32 word (pack_tb, batched)
    groups = -(-l // TB_PACK)
    pad = groups * TB_PACK - l
    if pad:
        tb = np.concatenate(
            [tb, np.zeros((n, pad, BAND), np.int32)], axis=1)
    tb = tb.reshape(n, groups, TB_PACK, BAND)
    shifts = (6 * np.arange(TB_PACK, dtype=np.int32))[None, None, :, None]
    packed = np.bitwise_or.reduce(tb << shifts, axis=2)
    return g, packed


def traceback(tb_packed: np.ndarray, exit_d: int, l: int | None = None):
    """Walk one PACKED traceback matrix from (L-1, exit_d) in state G.

    Returns (ops, first_db) where ops is the list of CIGAR ops
    'M','I','D' in query order and first_db the window-relative index of
    the first database base the alignment consumes (= position offset
    inside the window; the caller adds it to the window start).
    """
    if l is None:
        l = tb_packed.shape[0] * TB_PACK   # exact when L % TB_PACK == 0
    tb = unpack_tb(tb_packed, l)
    i, d, state = l - 1, int(exit_d), 0
    ops: list[str] = []
    first_db = 0
    while i >= 0:
        code = tb[i, d]
        if state == 0:       # G: consumed q_i vs db_{i+d}
            ops.append("M")
            first_db = i + d
            state = code & 3
            i -= 1
        elif state == 1:     # E: deletion, consumed db_{i+d} only
            ops.append("D")
            first_db = i + d
            state = (code >> 2) & 3
            d -= 1
        else:                # F: insertion, consumed query only
            ops.append("I")
            state = (code >> 4) & 3
            i -= 1
            d += 1
    ops.reverse()
    return ops, first_db


def ops_to_cigar(ops: list[str]) -> list[tuple[int, str]]:
    out: list[tuple[int, str]] = []
    for op in ops:
        if out and out[-1][1] == op:
            out[-1] = (out[-1][0] + 1, op)
        else:
            out.append((1, op))
    return out
