"""The checkpointed alignment workflow.

Reference analog: workflow::AlignWorkflow
(src/c++/include/workflow/AlignWorkflow.hh:64-292) — a phase state machine
whose full inter-phase state serializes to Temp/AlignerState after every
completed phase (AlignWorkflowSerialization.hh:23-110), with
--start-from / --stop-at rewind semantics (AlignWorkflow.cpp:532-590).

Phase mapping (the reference's MatchFinder+MatchSelector collapse into
one fused device pipeline here):

    Start -> TlsDone      learn template-length statistics (PE only)
          -> AlignDone    align all batches; records to Temp/aligned.sam
          -> ReportsDone  stats JSON + HTML (MatchSelectorStats analog)
          -> BamDone      coordinate sort + duplicate marking + BAM/bai/md5

State is JSON (AlignerState.json); phase artifacts live in Temp/ so any
phase can re-run from its predecessor's artifacts.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import numpy as np

from ..align.pairs import TlsStatic
from ..align.pipeline import AlignConfig, default_seed_offsets
from ..aligner import Aligner, PairedAligner
from ..build.dedup import coordinate_sort, mark_duplicates
from ..index.build import SeedIndex, build_index
from ..io import sam
from ..io.fasta import read_fasta
from ..io.fastq import ReadBatch, pad_batch, read_fastq

STATES = ("Start", "TlsDone", "AlignDone", "ReportsDone", "BamDone")


def parse_tls_override(spec: str) -> TlsStatic:
    """--tls 'min:median:max:lowStdDev:highStdDev:M0:M1' (manual.md:572-575)
    -> the static TLS model (mate window = [min, max], reference
    --mate-drift-range -1 default)."""
    parts = spec.split(":")
    if len(parts) != 7:
        raise ValueError(
            f"--tls {spec!r}: want min:median:max:lowStdDev:highStdDev:M0:M1")
    mn, _median, mx, _lo_sd, _hi_sd, m0, m1 = (int(x) for x in parts)
    if not (0 <= m0 <= 7 and 0 <= m1 <= 7):
        raise ValueError(f"--tls {spec!r}: models must be 0..7 (FFp..RRm)")
    return TlsStatic(min=mn, max=mx, mate_min=mn, mate_max=mx,
                     best0=m0, best1=m1)


@dataclasses.dataclass
class WorkflowOptions:
    reference: str                      # FASTA path or saved index directory
    output_dir: str
    fastq1: str | None = None
    fastq2: str | None = None           # paired-end when set
    bam_input: str | None = None        # realign from an existing BAM
    run_folder: str | None = None       # BCL run folder (native Illumina input)
    lanes: tuple[int, ...] | None = None    # BCL lane subset (default: all)
    tiles: tuple[int, ...] | None = None    # BCL tile subset (default: all)
    pf_only: bool = True                # BCL: drop non-pass-filter clusters
    use_bases_mask: str | None = None   # BCL: y/n/i per-cycle mask grammar
    seed_len: int = 32
    # per-index address-space cap; FASTA references over this split into
    # contig-group indexes automatically (index/groups.py)
    group_limit: int = 2**31 - 1
    batch_size: int = 4096
    # reference --neighborhood-size-threshold (0 = off, AlignOptions.cpp:96)
    neighborhood_size_threshold: int = 0
    tls_batches: int = 4
    keep_duplicates: bool = True        # mark, don't remove (reference default)
    mark_duplicates: bool = True
    gapped: bool = True
    sample: str = "sample"
    compression_level: int = 1
    base_quality_cutoff: int = 25
    clip_semialigned: bool = True
    clip_overlapping: bool = True
    adapters: tuple[str, ...] = ()
    # demultiplexing (reference: lib/demultiplexing + BarcodeBamMapping)
    sample_sheet: str | None = None     # CSV with barcode,sample[,project,lane]
    barcode_fastq: str | None = None    # index (I1) FASTQ, synchronized order
    barcode_mismatches: int = 1
    # known-gap realignment in the Build phase (reference --realign-gaps:
    # no | sample | project | all — gap-sharing scope across samples)
    realign_gaps: str = "sample"
    # reference --gap-scoring: bwa | eland | m:mm:go:ge[:me]
    gap_scoring: str = "bwa"
    # reference --seeds: auto | colon-separated offsets ("0:32:64"); a
    # comma-separated per-read list collapses to the first entry (all our
    # reads share geometry)
    seeds: str = "auto"
    # reference --repeat-threshold (align-time, default 10)
    repeat_threshold: int = 10
    # reference --first-pass-seeds (default 1; ignored when --seeds=auto
    # in the reference, honored always here)
    first_pass_seeds: int = 1
    # reference --dodgy-alignment-score: Unaligned | 0-254
    dodgy_alignment_score: str = "0"
    # reference --tls: 'min:median:max:lowStdDev:highStdDev:M0:M1' forces
    # the template-length model instead of learning it
    tls_override: str | None = None
    # genomic binning threshold: runs larger than this many records split
    # into position bins processed in bounded memory during the Build
    # phase (reference BinIndexMap + Build::sortBinParallel)
    records_per_bin: int = 1_000_000


class AlignWorkflow:
    def __init__(self, opts: WorkflowOptions):
        self.opts = opts
        self.out = Path(opts.output_dir)
        self.temp = self.out / "Temp"
        self.stats_dir = self.out / "Stats"
        for d in (self.out, self.temp, self.stats_dir):
            d.mkdir(parents=True, exist_ok=True)
        self.state = "Start"
        self._reads_cache = None
        self.tls: TlsStatic | None = None
        self._index: list[SeedIndex] | None = None
        self._stats: dict = {}

    # -- state (de)serialization -------------------------------------------

    @property
    def state_file(self) -> Path:
        return self.temp / "AlignerState.json"

    def save_state(self) -> None:
        doc = {"state": self.state, "stats": self._stats}
        if self.tls is not None:
            doc["tls"] = dataclasses.asdict(self.tls)
        self.state_file.write_text(json.dumps(doc, indent=2))

    def load_state(self) -> None:
        if self.state_file.exists():
            doc = json.loads(self.state_file.read_text())
            self.state = doc["state"]
            self._stats = doc.get("stats", {})
            if "tls" in doc:
                self.tls = TlsStatic(**doc["tls"])

    def rewind(self, start_from: str) -> None:
        """Reference AlignWorkflow::rewind — drop back to an earlier state."""
        if start_from not in STATES:
            raise ValueError(f"unknown state {start_from}")
        if STATES.index(start_from) < STATES.index(self.state):
            self.state = start_from

    # -- shared resources ---------------------------------------------------

    def _load_indexes(self) -> list[SeedIndex]:
        """One index per comma-separated --reference entry (contig-group
        indexes for genomes beyond one index's 2^31-base address space:
        parallel/multi_index.py)."""
        if self._index is None:
            from ..index.groups import is_grouped_reference, load_grouped_indexes
            indexes = []
            for part in str(self.opts.reference).split(","):
                ref = Path(part)
                if ref.is_dir() and is_grouped_reference(ref):
                    indexes.extend(load_grouped_indexes(ref))
                elif ref.is_dir():
                    indexes.append(SeedIndex.load(ref))
                else:
                    genome = read_fasta(ref)
                    from ..index.groups import (split_genome_groups,
                                                subset_genome)
                    groups = split_genome_groups(genome.contigs,
                                                 limit=self.opts.group_limit)
                    # 64-mer seeds search a 32-mer index + extension verify
                    sl = min(self.opts.seed_len, 32)
                    if len(groups) == 1:
                        indexes.append(build_index(genome, seed_len=sl))
                    else:
                        indexes.extend(
                            build_index(subset_genome(genome, names),
                                        seed_len=sl)
                            for names in groups)
            self._index = indexes
        return self._index

    def _load_index(self) -> SeedIndex:
        return self._load_indexes()[0]

    def _genome(self):
        """The (combined) genome for output phases."""
        idxs = self._load_indexes()
        if len(idxs) == 1:
            return idxs[0].genome
        from ..io.fasta import ContigMeta, Genome
        codes = np.concatenate([ix.genome.codes for ix in idxs])
        contigs, off, k = [], 0, 0
        for ix in idxs:
            for c in ix.genome.contigs:
                contigs.append(ContigMeta(index=k, name=c.name,
                                          offset=off + c.offset,
                                          length=c.length, md5=c.md5))
                k += 1
            off += ix.genome.total_length
        return Genome(codes=codes, contigs=contigs)

    @property
    def _paired(self) -> bool:
        if self.opts.bam_input or self.opts.run_folder:
            return self._load_all_reads()[1] is not None
        return bool(self.opts.fastq2)

    def _load_all_reads(self):
        if getattr(self, "_reads_cache", None) is None:
            if self.opts.bam_input:
                from ..io.bam_input import reads_from_bam
                self._reads_cache = reads_from_bam(self.opts.bam_input)
            elif self.opts.run_folder:
                from ..io.bcl import load_run_reads
                b1, b2, barcodes = load_run_reads(
                    self.opts.run_folder,
                    lanes=list(self.opts.lanes) if self.opts.lanes else None,
                    tiles=list(self.opts.tiles) if self.opts.tiles else None,
                    pf_only=self.opts.pf_only,
                    use_bases_mask=self.opts.use_bases_mask)
                self._bcl_barcodes = barcodes
                self._reads_cache = (b1, b2)
            else:
                if not self.opts.fastq1:
                    raise ValueError("need --fastq1, --run-folder or --bam input")
                b1 = read_fastq(self.opts.fastq1)
                b2 = read_fastq(self.opts.fastq2) if self.opts.fastq2 else None
                self._reads_cache = (b1, b2)
        return self._reads_cache

    def _read_batches(self) -> list[tuple[ReadBatch, ReadBatch | None]]:
        b1, b2 = self._load_all_reads()
        if b2 is not None and b1.count != b2.count:
            raise ValueError("fastq1/fastq2 read counts differ")
        bs = self.opts.batch_size
        out = []
        for lo in range(0, b1.count, bs):
            hi = min(lo + bs, b1.count)
            sl1 = ReadBatch(b1.names[lo:hi], b1.bases[lo:hi], b1.quals[lo:hi],
                            b1.lengths[lo:hi])
            sl1 = pad_batch(sl1, bs)
            if b2 is not None:
                sl2 = ReadBatch(b2.names[lo:hi], b2.bases[lo:hi], b2.quals[lo:hi],
                                b2.lengths[lo:hi])
                sl2 = pad_batch(sl2, bs)
            else:
                sl2 = None
            out.append((sl1, sl2))
        return out

    # -- phases -------------------------------------------------------------

    def _phase_tls(self) -> None:
        if not self._paired:
            self.tls = None
            return
        if self.opts.tls_override:
            self.tls = parse_tls_override(self.opts.tls_override)
            self._stats["tls"] = dataclasses.asdict(self.tls)
            return
        # learn on the largest contig group (TLS is a library property)
        index = max(self._load_indexes(),
                    key=lambda ix: ix.genome.total_length)
        batches = self._read_batches()
        aligner = PairedAligner.create(index, read_len=batches[0][0].read_len)
        learn = [(b1, b2) for b1, b2 in batches[: self.opts.tls_batches]]
        self.tls = aligner.learn_tls(learn)
        self._stats["tls"] = dataclasses.asdict(self.tls)

    def _phase_align(self) -> None:
        index = self._load_index()
        batches = self._read_batches()
        read_len = batches[0][0].read_len
        records: list[sam.SamRecord] = []
        stats = {"total_reads": 0, "aligned": 0, "perfect": 0,
                 "proper_pairs": 0, "mapq_hist": [0] * 61}
        t0 = time.time()
        o = self.opts
        from ..align.gapped import GapScoring
        clip_kw = dict(base_quality_cutoff=o.base_quality_cutoff,
                       clip_semialigned=o.clip_semialigned,
                       adapters=tuple(o.adapters),
                       gap_scoring=GapScoring.parse(o.gap_scoring))
        seed_len = max(o.seed_len, index.seed_len)
        if seed_len > 32 and index.seed_len != 32:
            raise ValueError("64-mer seeds need a 32-mer index")
        if o.seeds == "auto":
            offsets = default_seed_offsets(read_len, seed_len)
        else:
            first = o.seeds.split(",")[0]
            offsets = tuple(int(x) for x in first.split(":"))
        dodgy = o.dodgy_alignment_score
        cfg = AlignConfig(
            seed_len=seed_len,
            seed_offsets=offsets,
            repeat_threshold=o.repeat_threshold,
            max_hits_per_seed=o.repeat_threshold,
            first_pass_seeds=o.first_pass_seeds,
            dodgy_mapq=0 if dodgy == "Unaligned" else int(dodgy),
            dodgy_unaligned=dodgy == "Unaligned",
            neighborhood_size_threshold=o.neighborhood_size_threshold)
        barcode_of = self._resolve_barcodes()
        indexes = self._load_indexes()
        if len(indexes) > 1:
            from ..parallel.multi_index import (MultiIndexAligner,
                                                MultiIndexPairedAligner)
            if self._paired:
                aligner = MultiIndexPairedAligner.create(
                    indexes, read_len=read_len, cfg=cfg,
                    clip_overlapping=o.clip_overlapping, **clip_kw)
                if self.tls is not None:
                    aligner.tls = self.tls
                for b1, b2 in batches:
                    records.extend(aligner.align_to_sam(b1, b2))
            else:
                aligner = MultiIndexAligner.create(indexes, read_len=read_len,
                                                   cfg=cfg, **clip_kw)
                for b1, _ in batches:
                    records.extend(aligner.align_to_sam(b1))
        elif self._paired:
            aligner = PairedAligner.create(
                index, read_len=read_len, cfg=cfg,
                clip_overlapping=o.clip_overlapping, **clip_kw)
            if self.tls is not None:
                aligner.tls = self.tls
            for recs in aligner.align_to_sam_many(batches):
                records.extend(recs)
        else:
            aligner = Aligner.create(index, read_len=read_len, cfg=cfg, **clip_kw)
            for recs in aligner.align_to_sam_many(b1 for b1, _ in batches):
                records.extend(recs)
        if barcode_of is not None:
            from ..demultiplexing.samplesheet import UNKNOWN_SAMPLE
            specs = {sp.index: sp for sp in self._sample_specs()}
            demux_counts: dict[str, int] = {}
            for r in records:
                bi = barcode_of.get(r.qname, -1)
                sample = specs[bi].sample if bi >= 0 else UNKNOWN_SAMPLE
                r.set_tag("RG", "Z", sample)
                if not (r.flag & sam.FLAG_READ2):
                    demux_counts[sample] = demux_counts.get(sample, 0) + 1
            self._stats["demultiplexing"] = demux_counts
            (self.stats_dir / "DemultiplexingStats.json").write_text(
                json.dumps(demux_counts, indent=2))
        per_tile: dict[tuple[str, str], dict] = {}
        for r in records:
            stats["total_reads"] += 1
            if r.is_mapped:
                stats["aligned"] += 1
                stats["mapq_hist"][min(r.mapq, 60)] += 1
                if r.tags.get("NM", ("i", 1))[1] == 0:
                    stats["perfect"] += 1
            if r.flag & sam.FLAG_PROPER_PAIR and r.flag & sam.FLAG_READ1:
                stats["proper_pairs"] += 1
            if self.opts.run_folder:
                # Illumina names <inst>:<run>:<fc>:<lane>:<tile>:<x>:<y>
                parts = r.qname.split(":")
                if len(parts) >= 7:
                    t = per_tile.setdefault((parts[3], parts[4]),
                                            {"total": 0, "aligned": 0})
                    t["total"] += 1
                    t["aligned"] += int(r.is_mapped)
        if per_tile:
            stats["tiles"] = [
                {"lane": lane, "tile": tile, **agg}
                for (lane, tile), agg in sorted(per_tile.items())]
        stats["align_seconds"] = round(time.time() - t0, 2)
        self._stats["match_selector"] = stats
        if getattr(aligner, "finder_stats", None):
            self._stats["match_finder"] = dict(aligner.finder_stats)
        genome = self._genome()
        n_bins = max(1, -(-len(records) // self.opts.records_per_bin))
        if n_bins > 1:
            self._write_bins(records, genome, n_bins)
        else:
            # drop any stale bin files from a previous (binned) run: the
            # Build phase prefers Temp/bins when present
            import shutil
            if (self.temp / "bins").exists():
                shutil.rmtree(self.temp / "bins")
            sam.write_sam(self.temp / "aligned.sam", records, genome.contigs,
                          sample=self.opts.sample)

    def _write_bins(self, records, genome, n_bins: int) -> None:
        """Genomic binning (reference BinIndexMap,
        include/alignment/matchSelector/BinIndexMap.hh:44-96): whole
        templates route to the bin of their smallest mapped unclipped-5'
        anchor, so every copy of a duplicate template lands in ONE bin and
        per-bin dedup stays exact; unmapped-only templates go to the
        trailing unaligned bin.  Each bin then sorts/dedups/realigns in
        bounded memory in the Build phase."""
        import shutil

        from ..build.dedup import unclipped_five_prime
        bins_dir = self.temp / "bins"
        if bins_dir.exists():
            shutil.rmtree(bins_dir)
        bins_dir.mkdir(parents=True)
        g_len = sum(c.length for c in genome.contigs)
        bin_bp = max(1, -(-g_len // n_bins))
        offs = {c.name: c.offset for c in genome.contigs}
        by_name: dict[str, list[sam.SamRecord]] = {}
        for r in records:
            by_name.setdefault(r.qname, []).append(r)
        files: dict[str, object] = {}
        try:
            for recs in by_name.values():
                poss = [offs[r.rname] + unclipped_five_prime(r)
                        for r in recs if r.is_mapped and r.rname in offs]
                if not poss:
                    key = "unaligned"
                else:
                    key = f"bin_{min(max(min(poss), 0) // bin_bp, n_bins - 1):05d}"
                f = files.get(key)
                if f is None:
                    f = open(bins_dir / f"{key}.sam", "w")
                    files[key] = f
                for r in recs:
                    f.write(r.to_line() + "\n")
        finally:
            for f in files.values():
                f.close()

    def _sample_specs(self):
        from ..demultiplexing.samplesheet import parse_sample_sheet
        return parse_sample_sheet(self.opts.sample_sheet)

    def _resolve_barcodes(self) -> dict[str, int] | None:
        """Read-name -> barcode index map from the I1 FASTQ (reference
        BarcodeResolver over BCL barcode cycles)."""
        if not self.opts.sample_sheet:
            return None
        from ..demultiplexing.resolver import resolve_barcodes
        specs = self._sample_specs()
        if self.opts.run_folder:
            # BCL path: barcode cycles came straight off the index reads
            b1, _ = self._load_all_reads()
            idx = resolve_barcodes(self._bcl_barcodes, specs,
                                   self.opts.barcode_mismatches)
            return {n: int(i) for n, i in zip(b1.names, idx)}
        if self.opts.barcode_fastq:
            i1 = read_fastq(self.opts.barcode_fastq)
            idx = resolve_barcodes(i1.bases, specs,
                                   self.opts.barcode_mismatches)
            return {n: int(i) for n, i in zip(i1.names, idx)}
        # no index read: single no-index sample takes everything
        return {}

    def _phase_reports(self) -> None:
        """MatchSelectorStats / AlignmentReportGenerator analog: JSON +
        reference-shaped XML + a self-contained HTML report with inline
        SVG plots (workflow/reports.py)."""
        from . import reports
        stats = self._stats.get("match_selector", {})
        (self.stats_dir / "MatchSelectorStats.json").write_text(
            json.dumps(stats, indent=2))
        reports.write_match_selector_stats_xml(
            stats, self.stats_dir / "MatchSelectorStats.xml",
            sample=self.opts.sample)
        if "demultiplexing" in self._stats:
            reports.write_demultiplexing_stats_xml(
                self._stats["demultiplexing"],
                self.stats_dir / "DemultiplexingStats.xml")
        if "match_finder" in self._stats:
            reports.write_match_finder_stats_xml(
                self._stats["match_finder"],
                self.stats_dir / "MatchFinderStats.xml")
        reports.write_html_report(self._stats,
                                  self.stats_dir / "AlignmentReport.html")

    def _process_bin(self, records: list[sam.SamRecord], genome
                     ) -> tuple[list[sam.SamRecord], int]:
        """Sort + dedup + realign one bin's records (BinSorter::process)."""
        records = coordinate_sort(records, genome.contigs)
        if self.opts.mark_duplicates:
            records = mark_duplicates(records, keep=self.opts.keep_duplicates)
        realigned = 0
        if self.opts.realign_gaps != "no":
            from ..build.realign import collect_gaps, realign_records
            if self.opts.realign_gaps == "all" or not self.opts.sample_sheet:
                groups = [records]
            else:
                # per-sample (or per-project) gap scope: group on the RG tag
                by_scope: dict[str, list[sam.SamRecord]] = {}
                for r in records:
                    rg = str(r.tags.get("RG", ("Z", "default"))[1])
                    by_scope.setdefault(rg, []).append(r)
                groups = list(by_scope.values())
            for grp in groups:
                realigned += realign_records(grp, genome, collect_gaps(grp))
            records = coordinate_sort(records, genome.contigs)
        return records, realigned

    def _emit_bam(self, stream, contigs) -> None:
        """Route a coordinate-ordered record stream into the output BAM
        writer(s) — one per sample when demultiplexing (BarcodeBamMapping),
        one flat file otherwise."""
        from ..io.bam import BamWriter
        writers: dict[str | None, BamWriter] = {}

        def writer_for(rec: sam.SamRecord) -> BamWriter:
            if not self.opts.sample_sheet:
                key = None
            else:
                key = str(rec.tags.get("RG", ("Z", "unknown"))[1])
            w = writers.get(key)
            if w is None:
                if key is None:
                    path = self.out / "sorted.bam"
                    sample_name = self.opts.sample
                else:
                    d = self.out / key
                    d.mkdir(parents=True, exist_ok=True)
                    path = d / "sorted.bam"
                    sample_name = key
                w = BamWriter(path, contigs,
                              compression_level=self.opts.compression_level,
                              sample=sample_name)
                writers[key] = w
            return w

        buf: dict[str | None, list[sam.SamRecord]] = {}
        for rec in stream:
            w = writer_for(rec)
            key = None if not self.opts.sample_sheet else \
                str(rec.tags.get("RG", ("Z", "unknown"))[1])
            buf.setdefault(key, []).append(rec)
            if len(buf[key]) >= 4096:
                w.write(buf[key])
                buf[key] = []
        for key, recs in buf.items():
            if recs:
                writers[key].write(recs)
        for w in writers.values():
            w.close()

    def _phase_bam(self) -> None:
        import heapq
        import itertools

        genome = self._genome()
        bins_dir = self.temp / "bins"
        bin_paths = sorted(bins_dir.glob("bin_*.sam")) if bins_dir.is_dir() else []

        if not bin_paths:
            # single-bin path: everything fits in memory at once
            _, records = sam.read_sam(self.temp / "aligned.sam")
            records, realigned = self._process_bin(records, genome)
            dup = sum(1 for r in records if r.flag & sam.FLAG_DUPLICATE)
            n_records = len(records)
            stream = iter(records)
        else:
            # bin-parallel path (reference Build::sortBinParallel): each
            # genomic bin sorts/dedups/realigns independently in bounded
            # memory, then the sorted bin streams k-way-merge into the BAM
            realigned = 0
            dup = 0
            n_records = 0
            sorted_paths = []
            for bp in bin_paths:
                recs = list(sam.iter_sam(bp))
                recs, r_cnt = self._process_bin(recs, genome)
                realigned += r_cnt
                dup += sum(1 for r in recs if r.flag & sam.FLAG_DUPLICATE)
                n_records += len(recs)
                sp = bins_dir / ("sorted_" + bp.name[4:])
                with open(sp, "w") as f:
                    for r in recs:
                        f.write(r.to_line() + "\n")
                sorted_paths.append(sp)
            order = {c.name: c.index for c in genome.contigs}

            def coord_key(r: sam.SamRecord):
                if r.rname == "*":
                    return (len(order), 0, r.qname)
                return (order[r.rname], r.pos, r.qname)

            stream = heapq.merge(*(sam.iter_sam(p) for p in sorted_paths),
                                 key=coord_key)
            unal = bins_dir / "unaligned.sam"
            if unal.exists():
                extra = sam.iter_sam(unal)
                n_records += sum(1 for _ in sam.iter_sam(unal))
                stream = itertools.chain(stream, extra)

        self._stats["build"] = {"records": n_records, "duplicates": dup,
                                "realigned": realigned,
                                "bins": max(1, len(bin_paths))}
        (self.stats_dir / "BuildStats.json").write_text(
            json.dumps(self._stats["build"], indent=2))
        from . import reports
        reports.write_build_stats_xml(self._stats["build"],
                                      self.stats_dir / "BuildStats.xml")
        self._emit_bam(stream, genome.contigs)

    # -- driver -------------------------------------------------------------

    def step(self) -> None:
        from ..utils import tracing
        transitions = {"Start": (self._phase_tls, "TlsDone"),
                       "TlsDone": (self._phase_align, "AlignDone"),
                       "AlignDone": (self._phase_reports, "ReportsDone"),
                       "ReportsDone": (self._phase_bam, "BamDone")}
        if self.state not in transitions:
            raise RuntimeError(f"cannot step from {self.state}")
        fn, next_state = transitions[self.state]
        with tracing.phase(f"workflow {self.state} -> {next_state}"):
            fn()
        self.state = next_state

    def run(self, start_from: str | None = None, stop_at: str = "BamDone",
            resume: bool = False) -> None:
        if resume:
            self.load_state()
        if start_from:
            self.rewind(start_from)
        while STATES.index(self.state) < STATES.index(stop_at):
            self.step()
            self.save_state()
