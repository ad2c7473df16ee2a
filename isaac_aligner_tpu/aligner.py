"""High-level host driver: read batches in, SAM records out.

The host side of the reference's MatchSelector/Bam phases: converts the
fixed-shape device result tensors into SAM records (reference analog:
build/FragmentAccessorBamAdapter.hh field mapping)."""

from __future__ import annotations

import dataclasses

import numpy as np

from . import dna
from .align.pipeline import AlignConfig, IndexArrays, align_batch_jit, prepare_index, \
    default_seed_offsets
from .index.build import SeedIndex
from .io import sam
from .io.fastq import ReadBatch


@dataclasses.dataclass
class Aligner:
    index: SeedIndex
    arrays: IndexArrays
    cfg: AlignConfig

    @staticmethod
    def create(index: SeedIndex, read_len: int | None = None,
               cfg: AlignConfig | None = None) -> "Aligner":
        if cfg is None:
            offsets = default_seed_offsets(read_len or index.seed_len, index.seed_len)
            cfg = AlignConfig(seed_len=index.seed_len, seed_offsets=offsets)
        return Aligner(index=index, arrays=prepare_index(index), cfg=cfg)

    def align_batch_arrays(self, batch: ReadBatch) -> dict[str, np.ndarray]:
        """Run the device pipeline; returns host numpy result arrays."""
        out = align_batch_jit(self.arrays, batch.bases, batch.quals, self.cfg)
        return {k: np.asarray(v) for k, v in out.items()}

    def align_to_sam(self, batch: ReadBatch, phred_offset: int = 33) -> list[sam.SamRecord]:
        res = self.align_batch_arrays(batch)
        genome = self.index.genome
        records: list[sam.SamRecord] = []
        for i, name in enumerate(batch.names):
            if name.startswith("__pad"):
                continue
            length = int(batch.lengths[i])
            bases = batch.bases[i, :length]
            quals = batch.quals[i, :length]
            aligned = bool(res["aligned"][i])
            reverse = bool(res["reverse"][i])
            if aligned and reverse:
                seq = dna.decode(dna.revcomp(bases))
                qual = "".join(chr(int(q) + phred_offset) for q in quals[::-1])
            else:
                seq = dna.decode(bases)
                qual = "".join(chr(int(q) + phred_offset) for q in quals)
            if aligned:
                contig, local = genome.to_local(int(res["start"][i]))
                rec = sam.SamRecord(
                    qname=name,
                    flag=sam.FLAG_REVERSE if reverse else 0,
                    rname=contig,
                    pos=local + 1,
                    mapq=int(res["mapq"][i]),
                    cigar=f"{length}M",
                    seq=seq,
                    qual=qual,
                )
                rec.set_tag("NM", "i", int(res["edit_distance"][i]))
                rec.set_tag("SM", "i", int(res["mapq"][i]))
            else:
                rec = sam.SamRecord(
                    qname=name, flag=sam.FLAG_UNMAPPED, rname="*", pos=0,
                    mapq=0, cigar="*", seq=seq, qual=qual,
                )
            records.append(rec)
        return records
