"""SPMD alignment over a (data, shard) device mesh.

Design (SURVEY.md §5.8 "TPU-native equivalent"):

- `data` axis: read batches are split across devices (the reference's
  tile/cluster data parallelism, MatchSelector.cpp:279-291).
- `shard` axis: the sorted (k-mer, position) index is RANGE-sharded into
  equal record counts, split at k-mer boundaries so one k-mer's hit run
  never straddles shards (the reference's mask-file sharding axis,
  SortReference.mk:54-84, re-mapped from disk files onto HBM planes).
- Each device binary-searches its local shard for ALL of its data-row's
  seeds; per-shard hit lists are concatenated with an all_gather over the
  `shard` axis (rides ICI), then dedup + scoring + MAPQ run replicated
  on the shard axis.  Seed search cost is O(log(N/s)) per shard, and hit
  capacity per shard stays the full R so repeats clustered in one shard
  are not truncated.
- The genome plane is replicated (small-genome regime); whole-genome mode
  additionally shards the genome for scoring — future work, gated by
  HBM size.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align.pipeline import (AlignConfig, IndexArrays, build_bucket_table,
                              choose_bucket_width, dedup_candidates,
                              finalize_single_end, find_seed_hits, pack_genome)
from ..index.build import SeedIndex, TOO_MANY_POS
from ..ops import search


class ShardedIndexArrays(NamedTuple):
    """Index planes with a leading shard dimension [S, m]."""

    key_hi: jax.Array       # int32 [S, m] each row sorted, padded with I32_MAX
    key_lo: jax.Array       # int32 [S, m]
    pos: jax.Array          # int32 [S, m]
    n_real: jax.Array       # int32 [S, 1] real records per shard
    genome: jax.Array       # uint8 [G] replicated
    genome_packed: jax.Array  # uint32, replicated (see pipeline.pack_genome)
    genome_nbits: jax.Array
    contig_starts: jax.Array
    contig_ends: jax.Array
    has_neighbors: jax.Array  # uint8 [S, m]
    bucket_starts: jax.Array  # int32 [S, 2^width + 1]; width follows
                              # choose_bucket_width(index.num_records) so
                              # cfgs built via bucket_params_for match


def make_mesh(n_devices: int | None = None, data: int | None = None,
              shard: int | None = None) -> Mesh:
    """Build a (data, shard) mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None and shard is None:
        # favor index sharding (HBM capacity) over data parallelism
        shard = 1
        while shard * 2 <= n and (n // (shard * 2)) * (shard * 2) == n:
            shard *= 2
        data = n // shard
    elif data is None:
        data = n // shard
    elif shard is None:
        shard = n // data
    assert data * shard == n, (data, shard, n)
    dev_array = np.array(devices[:n]).reshape(data, shard)
    return Mesh(dev_array, ("data", "shard"))


def shard_index(index: SeedIndex, num_shards: int) -> ShardedIndexArrays:
    """Range-shard the sorted index into `num_shards` k-mer-aligned pieces.

    Split points advance to the next k-mer boundary so all records of one
    k-mer live in exactly one shard (keeps per-shard repeat_threshold
    semantics identical to the unsharded index).
    """
    n = index.num_records
    hi, lo = index.key_hi, index.key_lo
    bounds = [0]
    for s in range(1, num_shards):
        cut = min(n, s * n // num_shards)
        # advance cut while it would split a k-mer run
        while 0 < cut < n and hi[cut] == hi[cut - 1] and lo[cut] == lo[cut - 1]:
            cut += 1
        bounds.append(max(cut, bounds[-1]))
    bounds.append(n)

    lengths = [bounds[i + 1] - bounds[i] for i in range(num_shards)]
    m = search.pad_pow2(max(max(lengths), 1))
    i32max = np.int32(2**31 - 1)
    key_hi = np.full((num_shards, m), i32max, np.int32)
    key_lo = np.full((num_shards, m), i32max, np.int32)
    pos = np.full((num_shards, m), TOO_MANY_POS, np.int32)
    nb = np.zeros((num_shards, m), np.uint8)
    n_real = np.zeros((num_shards, 1), np.int32)
    nb_src = (index.has_neighbors if index.has_neighbors is not None
              else np.zeros(n, np.uint8))
    for s in range(num_shards):
        b, e = bounds[s], bounds[s + 1]
        key_hi[s, : e - b] = hi[b:e]
        key_lo[s, : e - b] = lo[b:e]
        pos[s, : e - b] = index.pos[b:e]
        nb[s, : e - b] = nb_src[b:e]
        n_real[s, 0] = e - b

    width = choose_bucket_width(index.num_records)
    buckets = np.zeros((num_shards, (1 << width) + 1), np.int32)
    for s in range(num_shards):
        buckets[s], _ = build_bucket_table(key_hi[s, : n_real[s, 0]], width)

    contigs = index.genome.contigs
    packed, nbits = pack_genome(index.genome.codes)
    return ShardedIndexArrays(
        bucket_starts=jnp.asarray(buckets),
        key_hi=jnp.asarray(key_hi),
        key_lo=jnp.asarray(key_lo),
        pos=jnp.asarray(pos),
        has_neighbors=jnp.asarray(nb),
        n_real=jnp.asarray(n_real),
        genome=jnp.asarray(index.genome.codes),
        genome_packed=jnp.asarray(packed),
        genome_nbits=jnp.asarray(nbits),
        contig_starts=jnp.asarray(np.array([c.offset for c in contigs], np.int32)),
        contig_ends=jnp.asarray(np.array([c.end for c in contigs], np.int32)),
    )


def place_sharded(mesh: Mesh, sharded: ShardedIndexArrays) -> ShardedIndexArrays:
    """Lay the index planes out on the mesh: shard dim over the `shard`
    axis, genome/contig metadata replicated."""
    shard_spec = NamedSharding(mesh, P("shard"))
    repl = NamedSharding(mesh, P())
    return ShardedIndexArrays(
        key_hi=jax.device_put(sharded.key_hi, shard_spec),
        key_lo=jax.device_put(sharded.key_lo, shard_spec),
        pos=jax.device_put(sharded.pos, shard_spec),
        has_neighbors=jax.device_put(sharded.has_neighbors, shard_spec),
        bucket_starts=jax.device_put(sharded.bucket_starts, shard_spec),
        n_real=jax.device_put(sharded.n_real, shard_spec),
        genome=jax.device_put(sharded.genome, repl),
        genome_packed=jax.device_put(sharded.genome_packed, repl),
        genome_nbits=jax.device_put(sharded.genome_nbits, repl),
        contig_starts=jax.device_put(sharded.contig_starts, repl),
        contig_ends=jax.device_put(sharded.contig_ends, repl),
    )


def sharded_align(mesh: Mesh, sharded: ShardedIndexArrays, bases, quals,
                  cfg: AlignConfig):
    """Jittable SPMD single-end alignment over the mesh.

    bases/quals: [B, L] with B divisible by the `data` axis size.
    Returns the same result dict as align_batch, sharded over `data`.
    """

    def local_fn(key_hi, key_lo, pos, nb, buckets, n_real, genome, gpack,
                 gnbits, cstarts, cends, b, q):
        # refs carry a leading shard-block dim of 1 inside shard_map
        local = IndexArrays(
            key_hi=key_hi[0], key_lo=key_lo[0], pos=pos[0],
            has_neighbors=nb[0], bucket_starts=buckets[0],
            n_real=n_real[0, 0], genome=genome,
            genome_packed=gpack, genome_nbits=gnbits,
            contig_starts=cstarts, contig_ends=cends)
        start_f, orient_f, valid_f, clean_f, _diag = find_seed_hits(local, cfg, b)
        # union hit lists from every index shard (ICI all-gather),
        # concatenating along the hits axis
        ag = lambda x: jax.lax.all_gather(x, "shard", axis=1, tiled=True)
        cand_start, cand_orient, cand_valid, cand_clean, support, diag_b = \
            dedup_candidates(ag(start_f), ag(orient_f), ag(valid_f),
                             ag(clean_f), cfg.max_candidates)
        well_anchored = cand_clean | (support >= 2)
        return finalize_single_end(local, cfg, b, q,
                                   cand_start, cand_orient, cand_valid, diag_b,
                                   well_anchored)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("shard", None), P("shard", None), P("shard", None),
                  P("shard", None), P("shard", None), P("shard", None),
                  P(), P(), P(), P(), P(),
                  P("data", None), P("data", None)),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(sharded.key_hi, sharded.key_lo, sharded.pos,
              sharded.has_neighbors, sharded.bucket_starts, sharded.n_real,
              sharded.genome, sharded.genome_packed, sharded.genome_nbits,
              sharded.contig_starts, sharded.contig_ends,
              bases, quals)


# ---------------------------------------------------------------------------
# Paired-end SPMD path (+ in-program shadow rescue)
# ---------------------------------------------------------------------------

def _local_index(key_hi, key_lo, pos, nb, buckets, n_real, genome, gpack,
                 gnbits, cstarts, cends) -> IndexArrays:
    """Unwrap the per-shard blocks shard_map hands the local function."""
    return IndexArrays(
        key_hi=key_hi[0], key_lo=key_lo[0], pos=pos[0],
        has_neighbors=nb[0], bucket_starts=buckets[0],
        n_real=n_real[0, 0], genome=genome,
        genome_packed=gpack, genome_nbits=gnbits,
        contig_starts=cstarts, contig_ends=cends)


def _sharded_end(local: IndexArrays, cfg: AlignConfig, bases, quals):
    """Per-shard seed search + ICI all-gather + dedup + scoring -> the
    same per-end dict score_end produces on one device."""
    from ..align.pipeline import score_candidates
    start_f, orient_f, valid_f, clean_f, _diag = find_seed_hits(
        local, cfg, bases)
    ag = lambda x: jax.lax.all_gather(x, "shard", axis=1, tiled=True)
    cs, co, cv, cc, support, diag_b = dedup_candidates(
        ag(start_f), ag(orient_f), ag(valid_f), ag(clean_f),
        cfg.max_candidates)
    wa = cc | (support >= 2)
    k = min(cfg.max_scored_candidates, cfg.max_candidates)
    sl = lambda x: x[:, :k]
    overflow = diag_b["num_candidates"] > k
    return score_candidates(local, cfg, bases, quals, sl(cs), sl(co),
                            sl(cv), sl(wa), diag_b["num_candidates"],
                            overflow)


def _rescue_inline(local: IndexArrays, cfg: AlignConfig, tls, res,
                   b1, q1, b2, q2):
    """Vectorized in-program shadow rescue + merge (the SPMD analog of
    PairedAligner._apply_rescue/_merge_rescue, which compact shadow rows
    on the host; here every row runs the window scan — fine for the
    data-parallel regime where the batch is already device-resident)."""
    from ..align import quality
    from ..align.pairs import pair_length, pair_model, rescue_shadows
    l1, l2 = b1.shape[1], b2.shape[1]
    window = -(-(tls.mate_max - tls.mate_min + 1) // 128) * 128
    g = int(local.genome.shape[0])
    rog_t = quality.rest_of_genome_correction(g, l1 + l2)
    for shadow_end, orphan_end in ((1, 2), (2, 1)):
        sb, sq = (b1, q1) if shadow_end == 1 else (b2, q2)
        o_start = res[f"start_{orphan_end}"].astype(jnp.int32)
        o_rev = res[f"reverse_{orphan_end}"]
        out = rescue_shadows(local, cfg, tls, orphan_end - 1, (l1, l2),
                             o_start, o_rev, sb, sq, window)
        se = f"_{shadow_end}"
        hit = res["shadow" + se] & out["found"]
        res["aligned" + se] = res["aligned" + se] | hit
        for key, val in (("start", out["start"]),
                         ("reverse", out["reverse"]),
                         ("mismatches", out["mismatches"]),
                         ("edit_distance", out["edit_distance"]),
                         ("log_prob", out["log_prob"])):
            res[key + se] = jnp.where(hit, val.astype(res[key + se].dtype),
                                      res[key + se])
        res["shadow" + se] = res["shadow" + se] & ~hit
        # rescued-pair scoring (TemplateBuilder rescued-template scoring)
        p_best = jnp.exp(out["log_prob"].astype(jnp.float32))
        others = jnp.maximum(out["total_prob"].astype(jnp.float32) - p_best,
                             0.0) + jnp.float32(rog_t)
        score = jnp.floor(-10.0 * jnp.log10(others / (others + p_best)))
        score = jnp.clip(score, 0, cfg.mapq_cap).astype(jnp.int32)
        res["frag_score" + se] = jnp.where(hit, score, res["frag_score" + se])
        res["template_score"] = jnp.where(hit, score, res["template_score"])
        p1, p2 = res["start_1"], res["start_2"]
        r1, r2 = res["reverse_1"], res["reverse_2"]
        model = pair_model(p1, r1, p2, r2)
        length = pair_length(p1, l1, p2, l2)
        nominal = ((model == tls.best0) | (model == tls.best1)) & \
            (length >= tls.min) & (length <= tls.max)
        res["pair_resolved"] = res["pair_resolved"] | hit
        res["proper_pair"] = jnp.where(hit, nominal, res["proper_pair"])
        res["template_length"] = jnp.where(
            hit, length.astype(res["template_length"].dtype),
            res["template_length"])
    return res


def sharded_align_paired(mesh: Mesh, sharded: ShardedIndexArrays,
                         b1, q1, b2, q2, cfg: AlignConfig, tls,
                         rescue: bool = True):
    """Jittable SPMD paired-end alignment over the (data, shard) mesh:
    per-shard seed search, ICI all-gather of hits, replicated pair
    resolution (align/pairs.paired_from_ends) and in-program shadow
    rescue.  Covers the full paired online pipeline — the round-1 SPMD
    path stopped at the single-end find-and-score slice."""
    from ..align.pairs import paired_from_ends
    l1, l2 = int(b1.shape[1]), int(b2.shape[1])
    g = int(sharded.genome.shape[0])

    def local_fn(key_hi, key_lo, pos, nb, buckets, n_real, genome, gpack,
                 gnbits, cstarts, cends, b1, q1, b2, q2):
        local = _local_index(key_hi, key_lo, pos, nb, buckets, n_real,
                             genome, gpack, gnbits, cstarts, cends)
        end1 = _sharded_end(local, cfg, b1, q1)
        end2 = _sharded_end(local, cfg, b2, q2)
        res = paired_from_ends(g, l1, l2, cfg, tls, end1, end2)
        res = {k: v for k, v in res.items()
               if isinstance(v, jax.Array) or hasattr(v, "dtype")}
        if rescue:
            res = _rescue_inline(local, cfg, tls, res, b1, q1, b2, q2)
        return res

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("shard", None), P("shard", None), P("shard", None),
                  P("shard", None), P("shard", None), P("shard", None),
                  P(), P(), P(), P(), P(),
                  P("data", None), P("data", None),
                  P("data", None), P("data", None)),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(sharded.key_hi, sharded.key_lo, sharded.pos,
              sharded.has_neighbors, sharded.bucket_starts, sharded.n_real,
              sharded.genome, sharded.genome_packed, sharded.genome_nbits,
              sharded.contig_starts, sharded.contig_ends,
              b1, q1, b2, q2)


# ---------------------------------------------------------------------------
# Collective duplicate marking (position-sharded shuffle + on-device sort)
# ---------------------------------------------------------------------------

def collective_dedup(mesh: Mesh, axis: str, anchor_self, anchor_mate,
                     rank, tie, cls, lib, capacity_factor: float = 4.0):
    """Jittable collective duplicate marking over one mesh axis.

    The SPMD analog of the Build phase's per-bin dedup (SURVEY §5.8
    "collective shuffle onto position-sharded owners + on-device sort"):
    every record routes to the device owning its anchor (all_to_all over
    ICI), owners sort received records by the duplicate key
    (cls, lib, anchor_self, anchor_mate) with rank/tie descending, mark
    every non-first key member, and the flags ride the inverse all_to_all
    home.

    64-bit columns (anchors/rank/tie) travel as hi/lo int32 plane pairs
    so the kernel works without jax x64 mode.  Inputs MUST be host numpy
    int64 arrays ([N], N divisible by the axis size) — a jnp array would
    already have been truncated to int32 under the default x64=off
    config, silently corrupting the keys.  Returns
    (dup flags [N] bool, overflow [devices] int32) — overflow counts rows
    that exceeded a destination's receive capacity (kept as
    non-duplicates, reported, never silently wrong-marked).
    """
    n_dev = mesh.shape[axis]

    def split64(v):
        """int64 -> (hi, lo) int32 planes whose SIGNED lexicographic
        order equals the int64 order (lo is bias-flipped so bit 31
        doesn't wrap the comparison)."""
        v = np.asarray(v, np.int64)
        hi = (v >> 32).astype(np.int32)
        lo = ((v & 0xFFFFFFFF) - 0x80000000).astype(np.int32)
        return hi, lo

    s_hi, s_lo = split64(anchor_self)
    m_hi, m_lo = split64(anchor_mate)
    r_hi, r_lo = split64(rank)
    t_hi, t_lo = split64(tie)
    cls32 = np.asarray(cls, np.int32)
    lib32 = np.asarray(lib, np.int32)

    def local_fn(s_hi, s_lo, m_hi, m_lo, r_hi, r_lo, t_hi, t_lo, cls_, lib_):
        n_loc = s_hi.shape[0]
        cap = int(np.ceil(capacity_factor * n_loc / n_dev))
        consider = cls_ >= 0
        # owner by a multiplicative hash of the anchor (raw `% n_dev`
        # routes even-only positional anchors to half the devices);
        # skipped rows route nowhere
        h = (s_lo * jnp.int32(-1640531527)) ^ s_hi
        owner = jnp.where(consider, (h & 0x7FFFFFFF) % n_dev, n_dev)

        # slot rows into the [n_dev, cap] send buffer
        order = jnp.argsort(owner, stable=True)
        owner_s = owner[order]
        idx = jnp.arange(n_loc, dtype=jnp.int32)
        run_start = jnp.searchsorted(owner_s, owner_s, side="left")
        within = idx - run_start
        ok = (owner_s < n_dev) & (within < cap)
        slot = jnp.where(ok, owner_s * cap + within, n_dev * cap)
        overflow = jnp.sum((owner_s < n_dev) & (within >= cap))

        def send(v, fill):
            buf = jnp.full(n_dev * cap + 1, fill, jnp.int32)
            buf = buf.at[slot].set(v[order].astype(jnp.int32), mode="drop")
            return buf[:-1].reshape(n_dev, cap)

        cols = [s_hi, s_lo, m_hi, m_lo, r_hi, r_lo, t_hi, t_lo, cls_, lib_,
                idx]
        fills = [0, 0, 0, 0, -1, -1, -1, -1, -1, -1, -1]
        payload = jnp.stack([send(v, f) for v, f in zip(cols, fills)],
                            axis=-1)                   # [n_dev, cap, 11]
        recv = jax.lax.all_to_all(payload, axis, split_axis=0,
                                  concat_axis=0, tiled=True)
        r = recv.reshape(n_dev * cap, 11)
        (rs_hi, rs_lo, rm_hi, rm_lo, rr_hi, rr_lo, rt_hi, rt_lo, rc, rl,
         rsrc) = (r[:, i] for i in range(11))
        valid = (rc >= 0).astype(jnp.int32)

        # sort by dup key; rank/tie descending via bitwise-not of the
        # (unsigned-ordered) hi/lo planes
        flip = lambda x: ~x
        pos0 = jnp.arange(n_dev * cap, dtype=jnp.int32)
        sorted_cols = jax.lax.sort(
            (1 - valid, rc, rl, rs_hi, rs_lo, rm_hi, rm_lo,
             flip(rr_hi), flip(rr_lo), flip(rt_hi), flip(rt_lo), pos0),
            num_keys=11)
        inv_s, c2, l2_, sh2, sl2, mh2, ml2 = sorted_cols[:7]
        pos2 = sorted_cols[-1]
        same = jnp.concatenate([
            jnp.zeros(1, bool),
            (c2[1:] == c2[:-1]) & (l2_[1:] == l2_[:-1])
            & (sh2[1:] == sh2[:-1]) & (sl2[1:] == sl2[:-1])
            & (mh2[1:] == mh2[:-1]) & (ml2[1:] == ml2[:-1])
            & (inv_s[1:] == 0) & (inv_s[:-1] == 0)])
        dup = jnp.zeros(n_dev * cap, jnp.int32).at[pos2].set(
            same.astype(jnp.int32))

        # route flags home: same [n_dev, cap] layout back + scatter by src
        back = jax.lax.all_to_all(
            jnp.stack([dup.reshape(n_dev, cap),
                       rsrc.reshape(n_dev, cap)], axis=-1),
            axis, split_axis=0, concat_axis=0, tiled=True)
        b2 = back.reshape(n_dev * cap, 2)
        flags = jnp.zeros(n_loc + 1, jnp.int32).at[
            jnp.where(b2[:, 1] >= 0, b2[:, 1], n_loc)].max(
            b2[:, 0], mode="drop")
        return flags[:-1].astype(bool), overflow[None].astype(jnp.int32)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=tuple([P(axis)] * 10),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(s_hi, s_lo, m_hi, m_lo, r_hi, r_lo, t_hi, t_lo, cls32, lib32)
