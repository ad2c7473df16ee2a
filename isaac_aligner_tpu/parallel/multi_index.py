"""Multi-index alignment: genomes beyond one index's address space.

A single index shard addresses < 2^31 bases (int32 position planes, a
deliberate TPU layout choice — index/build.py:144).  Whole GRCh38
(3.1 Gbp) therefore splits into contig GROUPS, each under the limit,
built as independent indexes (the reference instead widens positions to
40 bits, ReferencePosition.hh:55-180 — on TPU that would force emulated
int64 everywhere).

MultiIndexAligner runs the fused device pipeline against every group and
merges per-read results on the host with EXACT cross-group MAPQ: each
group reports its best log-probability and its in-group neighborhood
probability mass (others_sum), so the merged neighborhood is

    others_total = sum_g others_g + sum_{g != best} exp(best_lp_g)

and MAPQ re-derives from (best_lp, others_total) with the rest-of-genome
prior computed over the TOTAL genome length — identical math to the
single-index pipeline (align/pipeline.py finalize_single_end), just
re-associated on the host.

Single-end only for now; the paired resolver needs per-group template
mass merging (round-2 work, noted in PARITY.md).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..align import quality
from ..aligner import Aligner
from ..index.build import SeedIndex
from ..io import sam
from ..io.fastq import ReadBatch


def split_genome_groups(contigs, limit: int = 2**31 - 1) -> list[list[str]]:
    """Greedy partition of contig names into groups under `limit` bases."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_len = 0
    for c in contigs:
        if c.length > limit:
            raise ValueError(f"contig {c.name} alone exceeds {limit} bases")
        if cur and cur_len + c.length > limit:
            groups.append(cur)
            cur, cur_len = [], 0
        cur.append(c.name)
        cur_len += c.length
    if cur:
        groups.append(cur)
    return groups


@dataclasses.dataclass
class MultiIndexAligner:
    """Single-end alignment across several contig-group indexes."""

    aligners: list[Aligner]

    @staticmethod
    def create(indexes: list[SeedIndex], read_len: int, **opts
               ) -> "MultiIndexAligner":
        names = set()
        for ix in indexes:
            for c in ix.genome.contigs:
                if c.name in names:
                    raise ValueError(f"contig {c.name} in more than one index")
                names.add(c.name)
        return MultiIndexAligner(
            [Aligner.create(ix, read_len=read_len, **opts) for ix in indexes])

    @property
    def total_genome_length(self) -> int:
        return sum(sum(c.length for c in a.index.genome.contigs)
                   for a in self.aligners)

    def align_to_sam(self, batch: ReadBatch,
                     phred_offset: int = 33) -> list[sam.SamRecord]:
        results = [a.align_batch_arrays(batch) for a in self.aligners]

        n = batch.bases.shape[0]
        lp = np.stack([r["log_prob"] for r in results])        # [G, B]
        others = np.stack([r["others_sum"] for r in results])
        aligned = np.stack([r["aligned"] for r in results])
        lp = np.where(aligned, lp, -np.inf)

        best_g = np.argmax(lp, axis=0)                         # [B]
        any_aligned = aligned.any(axis=0)
        best_lp = lp[best_g, np.arange(n)]
        # neighborhood mass across ALL groups minus the winner itself
        exp_lp = np.where(np.isfinite(lp), np.exp(lp), 0.0)
        others_total = others.sum(axis=0) + exp_lp.sum(axis=0) \
            - np.where(any_aligned, np.exp(best_lp), 0.0)

        rog = quality.rest_of_genome_correction(self.total_genome_length,
                                                batch.read_len)
        mapq_f = np.asarray(quality.mapping_quality(
            best_lp.astype(np.float32), others_total.astype(np.float32),
            np.float32(rog)))
        cap = self.aligners[0].cfg.mapq_cap
        merged_mapq = np.clip(np.floor(mapq_f), 0, cap).astype(np.int32)

        records: list[sam.SamRecord] = []
        for i, name in enumerate(batch.names):
            if name.startswith("__pad"):
                continue
            g = int(best_g[i])
            res = results[g]
            al = self.aligners[g]
            # group records built one read at a time through the group's
            # own record builder (keeps CIGAR/tags/flags identical), then
            # the merged MAPQ replaces the in-group one
            sub = ReadBatch([name], batch.bases[i : i + 1],
                            batch.quals[i : i + 1], batch.lengths[i : i + 1])
            def row_slice(v):
                if isinstance(v, np.ndarray) and v.ndim >= 1 and len(v) == n:
                    return v[i : i + 1]
                if isinstance(v, list) and len(v) == n:   # cigar lists
                    return v[i : i + 1]
                return v
            sub_res = {k: row_slice(v) for k, v in res.items()}
            rec = al._records_from_res(sub, sub_res, phred_offset)[0]
            if rec.is_mapped:
                # the in-group gate (well-anchored / dodgy zeroing) wins
                # over the merged score
                mq = 0 if res["mapq"][i] == 0 else int(merged_mapq[i])
                rec.mapq = mq
                rec.set_tag("SM", "i", mq)
            records.append(rec)
        return records
