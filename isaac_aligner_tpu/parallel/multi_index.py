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

MultiIndexPairedAligner does the same for pairs: the template score
re-derives from summed per-group pair-probability masses.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..align import quality
from ..aligner import Aligner
from ..index.build import SeedIndex
from ..io import sam
from ..io.fastq import ReadBatch


# host-only helper lives with the index builders; re-exported here for the
# aligner-facing surface
from ..index.groups import split_genome_groups  # noqa: F401


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
        safe_lp = np.where(any_aligned, best_lp, 0.0)   # rows stay unmapped
        mapq_f = np.asarray(quality.mapping_quality(
            safe_lp.astype(np.float32), others_total.astype(np.float32),
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


@dataclasses.dataclass
class MultiIndexPairedAligner:
    """Paired-end alignment across contig-group indexes.

    Per-group PairedAligner results merge on the host: the winning group
    is the one with the highest joint log-probability (pair lp when both
    ends aligned, single-end lp otherwise); the template score re-derives
    from the SUMMED cross-group pair-probability mass
    (resolve_pairs total_prob per group, align/pairs.py) and each end's
    mapping score from the summed end neighborhoods — the same math the
    reference runs per cluster (TemplateBuilder.cpp:233-286,435-447),
    re-associated across groups.
    """

    aligners: list  # list[PairedAligner]

    @staticmethod
    def create(indexes: list[SeedIndex], read_len: int, **opts
               ) -> "MultiIndexPairedAligner":
        from ..aligner import PairedAligner
        names = set()
        for ix in indexes:
            for c in ix.genome.contigs:
                if c.name in names:
                    raise ValueError(f"contig {c.name} in more than one index")
                names.add(c.name)
        return MultiIndexPairedAligner(
            [PairedAligner.create(ix, read_len=read_len, **opts)
             for ix in indexes])

    @property
    def tls(self):
        return self.aligners[0].tls

    @tls.setter
    def tls(self, value) -> None:
        for a in self.aligners:
            a.tls = value

    def learn_tls(self, batches):
        """Learn TLS on the largest group (insert-size statistics are a
        library property, not a genome-region one) and share it."""
        biggest = max(self.aligners,
                      key=lambda a: a.index.genome.total_length)
        stats = biggest.learn_tls(batches)
        self.tls = stats
        return stats

    @property
    def total_genome_length(self) -> int:
        return sum(a.index.genome.total_length for a in self.aligners)

    def align_to_sam(self, b1: ReadBatch, b2: ReadBatch,
                     phred_offset: int = 33) -> list[sam.SamRecord]:
        results = [a.align_batch_arrays(b1, b2) for a in self.aligners]
        n = b1.bases.shape[0]
        neg_inf = -np.inf

        def joint_lp(r):
            a1, a2 = r["aligned_1"], r["aligned_2"]
            lp1 = np.where(a1, r["log_prob_1"], 0.0)
            lp2 = np.where(a2, r["log_prob_2"], 0.0)
            any_al = a1 | a2
            return np.where(any_al, lp1 + lp2, neg_inf)

        jl = np.stack([joint_lp(r) for r in results])          # [G, B]
        best_g = np.argmax(jl, axis=0)

        g_total = self.total_genome_length
        read_lens = (b1.read_len, b2.read_len)
        rog_t = quality.rest_of_genome_correction(g_total, sum(read_lens))
        rogs = [quality.rest_of_genome_correction(g_total, l)
                for l in read_lens]

        # summed cross-group masses
        pair_total = np.stack([r["pair_total_prob"] for r in results]).sum(0)
        end_others = []
        for e in (1, 2):
            o = np.stack([r[f"others_sum_{e}"] for r in results])
            lp = np.stack([np.where(r[f"aligned_{e}"], r[f"log_prob_{e}"],
                                    neg_inf) for r in results])
            exp_lp = np.where(np.isfinite(lp), np.exp(lp), 0.0)
            end_others.append((o.sum(0), exp_lp.sum(0), lp))

        records: list[sam.SamRecord] = []
        cap = self.aligners[0].cfg.mapq_cap
        for i in range(n):
            name = b1.names[i]
            if name.startswith("__pad"):
                continue
            g = int(best_g[i])
            res = results[g]
            al = self.aligners[g]

            def row_slice(v):
                if isinstance(v, np.ndarray) and v.ndim >= 1 and len(v) == n:
                    return v[i : i + 1].copy()
                if isinstance(v, list) and len(v) == n:
                    return v[i : i + 1]
                return v
            sub = {k: row_slice(v) for k, v in res.items()}

            # merged template score: neighborhood over ALL groups
            if bool(res["pair_resolved"][i]):
                p_best = float(np.exp(res["pair_best_lp"][i]))
                others = max(float(pair_total[i]) - p_best, 0.0) + rog_t
                denom = float(pair_total[i]) + rog_t
                ts = int(np.floor(-10.0 * np.log10(others / denom)))
                sub["template_score"][0] = np.clip(ts, -1, cap)
            # merged per-end scores
            for e_idx, e in enumerate((1, 2)):
                if not bool(res[f"aligned_{e}"][i]):
                    continue
                if res[f"frag_score_{e}"][i] == 0:
                    continue   # in-group gate (dodgy / not well-anchored)
                o_sum, exp_sum, lp = end_others[e_idx]
                best_lp = float(lp[g, i])
                others_total = float(o_sum[i]) + float(exp_sum[i]) \
                    - float(np.exp(best_lp))
                mq = float(np.asarray(quality.mapping_quality(
                    np.float32(best_lp), np.float32(max(others_total, 0.0)),
                    np.float32(rogs[e_idx]))))
                sub[f"frag_score_{e}"][0] = np.clip(
                    np.floor(mq), 0, cap).astype(np.int32)

            sub_b1 = ReadBatch([name], b1.bases[i : i + 1],
                               b1.quals[i : i + 1], b1.lengths[i : i + 1])
            sub_b2 = ReadBatch([name], b2.bases[i : i + 1],
                               b2.quals[i : i + 1], b2.lengths[i : i + 1])
            records.extend(al._records_from_res(sub_b1, sub_b2, sub,
                                                phred_offset))
        return records
