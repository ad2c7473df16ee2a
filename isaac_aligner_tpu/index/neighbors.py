"""Neighbor annotation: mark k-mers having <=N-mismatch neighbors elsewhere
in the genome.

Reference analog: oligo::Permutate (src/c++/include/oligo/Permutate.hh:42-106,
lib/oligo/Permutate.cpp:125-175) and NeighborsFinder
(src/c++/lib/reference/NeighborsFinder.cpp:66-384).

The algorithm is the reference's (it is the right algorithm — a
pigeonhole block design):  split the k-mer into 2*E equal blocks; any two
k-mers within Hamming distance <= E (in bases) differ in at most E
blocks, so for SOME choice of E clean blocks moved to the prefix the two
k-mers share an equal prefix.  For every C(2E, E) block selection:
permute, sort, scan equal-prefix runs, and mark pairs whose suffix
differs in 1..E bases.  Marked k-mers get the "has neighbors" bit that
(a) demotes their seeds' anchoring confidence (MAPQ gating,
TemplateBuilder::updateMappingScore) and (b) in the reference feeds the
neighbor-matching second pass.

Host-side vectorized numpy: block permutations are table lookups over
16-bit halves; equal-prefix runs are found with one diff over the sorted
array, and only runs of length >= 2 are examined (random genomes have
almost none; repeat-heavy runs are capped like the reference's
repeat-threshold gating).
"""

from __future__ import annotations

import itertools

import numpy as np

#: annotation width (mismatches), reference neighborhoodWidth=4
#: (include/reference/NeighborsFinder.hh:75)
DEFAULT_WIDTH = 4


def block_permutations(error_count: int = DEFAULT_WIDTH) -> list[tuple[int, ...]]:
    """All prefix selections of `error_count` blocks out of 2*error_count.

    Each permutation lists the block order (prefix blocks first), blocks
    numbered from the most significant end — the reference's ABCD-chain
    (Permutate.cpp:125-175) enumerates the same C(2E, E) selections.
    """
    n = 2 * error_count
    perms = []
    for prefix in itertools.combinations(range(n), error_count):
        suffix = tuple(i for i in range(n) if i not in prefix)
        perms.append(prefix + suffix)
    return perms


def permute_blocks(kmers: np.ndarray, order: tuple[int, ...], k: int) -> np.ndarray:
    """Rearrange the 2-bit blocks of packed k-mers into `order`.

    kmers: uint64 array of big-endian packed k-mers; block 0 is the most
    significant.  Vectorized shift/mask per block (2E shifts total).
    """
    n_blocks = len(order)
    block_bases = k // n_blocks
    bb = 2 * block_bases
    mask = np.uint64((1 << bb) - 1)
    out = np.zeros_like(kmers)
    for dst, src in enumerate(order):
        src_shift = np.uint64((n_blocks - 1 - src) * bb)
        dst_shift = np.uint64((n_blocks - 1 - dst) * bb)
        out |= ((kmers >> src_shift) & mask) << dst_shift
    return out


def _base_mismatches_u64(x: np.ndarray) -> np.ndarray:
    """Count differing 2-bit bases given XOR of two packed k-mers."""
    lo = (x | (x >> np.uint64(1))) & np.uint64(0x5555555555555555)
    # popcount of lo
    v = lo
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + ((v >> np.uint64(2)) & np.uint64(0x3333333333333333))
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (v * np.uint64(0x0101010101010101)) >> np.uint64(56)


def find_neighbors(kmers: np.ndarray, k: int = 32,
                   error_count: int = DEFAULT_WIDTH,
                   run_cap: int = 256) -> np.ndarray:
    """Return a bool array marking k-mers with >=1 neighbor within
    `error_count` mismatches among the OTHER k-mers in the input.

    `kmers` should be the UNIQUE k-mers (uint64, any order).  Runs of
    equal prefixes longer than `run_cap` are truncated (quadratic scan
    bound, analogous to the reference's repeat gating).
    """
    kmers = np.asarray(kmers, dtype=np.uint64)
    n = kmers.shape[0]
    has = np.zeros(n, dtype=bool)
    if n < 2:
        return has
    n_blocks = 2 * error_count
    bb = 2 * (k // n_blocks)
    prefix_shift = np.uint64(error_count * bb)
    suffix_mask = np.uint64((1 << (error_count * bb)) - 1)

    for order in block_permutations(error_count):
        permuted = permute_blocks(kmers, order, k)
        idx = np.argsort(permuted, kind="stable")
        s = permuted[idx]
        pref = s >> prefix_shift
        run_start = np.flatnonzero(np.concatenate(
            [[True], pref[1:] != pref[:-1]]))
        run_end = np.concatenate([run_start[1:], [n]])
        for a, b in zip(run_start, run_end):
            size = b - a
            if size < 2:
                continue
            b = a + min(size, run_cap)
            suf = s[a:b] & suffix_mask
            diff = suf[:, None] ^ suf[None, :]
            mm = _base_mismatches_u64(diff)
            near = (mm <= error_count)
            np.fill_diagonal(near, False)
            hit = near.any(axis=1)
            has[idx[a:b][hit]] = True
    return has


def annotate_index(key_hi: np.ndarray, key_lo: np.ndarray, k: int,
                   error_count: int = DEFAULT_WIDTH,
                   run_cap: int = 256) -> np.ndarray:
    """Neighbor bits for SORTED (possibly duplicated) index key planes.

    Reconstructs uint64 k-mers from the biased int32 planes, annotates
    unique k-mers, and expands back to per-record bits.
    """
    from .build import unbias_i32_to_u32

    hi = unbias_i32_to_u32(key_hi).astype(np.uint64)
    lo = unbias_i32_to_u32(key_lo).astype(np.uint64)
    # k=32 packs into 64 bits (hi:lo); k=16 lives entirely in hi
    kmers = (hi << np.uint64(32)) | lo if k == 32 else hi
    uniq, inverse = np.unique(kmers, return_inverse=True)
    bits = find_neighbors(uniq, k=k, error_count=error_count, run_cap=run_cap)
    return bits[inverse]
