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
