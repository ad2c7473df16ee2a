"""Alignment throughput benchmark — prints ONE JSON line.

Runs the fused single-end pipeline on the available accelerator (the real
TPU chip under the driver) against a synthetic E. coli-scale genome
(4.6 Mbp) with 100 bp reads at ~1% mismatch rate, and reports
reads/s/chip.

Baseline for `vs_baseline`: reference iSAAC (Raczy et al., Bioinformatics
2013) aligns a 40x human genome (~1.28e9 2x100bp reads) in ~5.5 h on one
24-core 2.6 GHz node => ~6.5e4 reads/s/node.  The repo itself publishes
no benchmark numbers (BASELINE.md), so this paper-scale figure is the
documented stand-in; vs_baseline = ours / 64600.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# The tunneled-TPU plugin compiles XLA programs on this (small) host unless
# remote compilation is requested at interpreter startup; re-exec once with
# the flag so benchmark compiles take ~1 min instead of ~10.
if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"):
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, os.environ)

BASELINE_READS_PER_SEC = 64_600.0

GENOME_LEN = 4_600_000
READ_LEN = 100
BATCH = 32_768
WARMUP_BATCHES = 1
TIMED_BATCHES = 8


def main() -> None:
    import jax
    from isaac_aligner_tpu.align.pipeline import (AlignConfig, align_batch_jit,
                                                  bucket_params_for,
                                                  default_seed_offsets, prepare_index)
    from isaac_aligner_tpu.index.build import build_index
    from isaac_aligner_tpu.io.fasta import genome_from_sequences

    rng = np.random.default_rng(0)
    seq_codes = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
    from isaac_aligner_tpu.io.fasta import ContigMeta, Genome
    genome = Genome(codes=seq_codes,
                    contigs=[ContigMeta(index=0, name="ecoli_sim", offset=0,
                                        length=GENOME_LEN, md5="0" * 32)])
    t0 = time.time()
    index = build_index(genome, seed_len=32)
    build_s = time.time() - t0

    from isaac_aligner_tpu.align.pipeline import genome_has_n_for
    bw, bl = bucket_params_for(index)
    cfg = AlignConfig(seed_len=32, seed_offsets=default_seed_offsets(READ_LEN, 32),
                      bucket_width=bw, bucket_log2=bl,
                      genome_has_n=genome_has_n_for(index))
    arrays = prepare_index(index)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, GENOME_LEN - READ_LEN, BATCH)
        reads = seq_codes[starts[:, None] + np.arange(READ_LEN)[None, :]]
        mut = r.random(reads.shape) < 0.01
        reads = np.where(mut, r.integers(0, 4, reads.shape), reads).astype(np.uint8)
        rc = reads[:, ::-1]
        rc = np.where(rc < 4, 3 - rc, rc).astype(np.uint8)
        flip = r.random(BATCH) < 0.5
        reads = np.where(flip[:, None], rc, reads)
        quals = np.full(reads.shape, 30, np.uint8)
        return jax.numpy.asarray(reads), jax.numpy.asarray(quals)

    batches = [make_batch(i) for i in range(WARMUP_BATCHES + TIMED_BATCHES)]

    # warmup / compile — the fetch matters: the tunneled backend pays a
    # large one-time cost on the first device->host readback
    for b, q in batches[:WARMUP_BATCHES]:
        out = align_batch_jit(arrays, b, q, cfg)
        jax.device_get(out["aligned"])

    t0 = time.time()
    outs = []
    for b, q in batches[WARMUP_BATCHES:]:
        out = align_batch_jit(arrays, b, q, cfg)
        outs.append(out["aligned"])
    jax.block_until_ready(outs)
    dt = time.time() - t0
    aligned = int(sum(jax.device_get(o).sum() for o in outs))

    total_reads = TIMED_BATCHES * BATCH
    rps = total_reads / dt

    # secondary metric: paired-end (2x100bp) throughput — the BASELINE
    # metric's read geometry; TLS fixed so the measurement is pure
    # device pipeline (pair resolution + template scoring included)
    import functools

    from isaac_aligner_tpu.align.pairs import TlsStatic, align_paired_batch

    pb = BATCH // 2
    pr = np.random.default_rng(7)
    pstarts = pr.integers(0, GENOME_LEN - 500, pb)
    p1 = seq_codes[pstarts[:, None] + np.arange(READ_LEN)[None, :]]
    m = seq_codes[(pstarts + 300 - READ_LEN)[:, None] + np.arange(READ_LEN)[None, :]]
    p2 = np.where(m[:, ::-1] < 4, 3 - m[:, ::-1], m[:, ::-1]).astype(np.uint8)
    mutp = pr.random(p1.shape) < 0.01
    p1 = np.where(mutp, pr.integers(0, 4, p1.shape), p1).astype(np.uint8)
    pq = np.full((pb, READ_LEN), 30, np.uint8)
    tls = TlsStatic(min=200, max=400, mate_min=200, mate_max=400,
                    best0=1, best1=6)

    @functools.partial(jax.jit, static_argnames=("cfg", "tls"))
    def paired_jit(arrays, b1, q1, b2, q2, cfg, tls):
        return align_paired_batch(arrays, b1, q1, b2, q2, cfg, tls)

    args = tuple(jax.numpy.asarray(x) for x in (p1, pq, p2, pq))
    outp = paired_jit(arrays, *args, cfg, tls)
    jax.device_get(outp["proper_pair"])
    t0 = time.time()
    preps = 4
    pouts = [paired_jit(arrays, *args, cfg, tls)["proper_pair"]
             for _ in range(preps)]
    jax.block_until_ready(pouts)
    paired_rps = preps * 2 * pb / (time.time() - t0)

    # secondary metric: banded Smith-Waterman GCUPS (BASELINE.json asks for
    # the SW kernel at per-chip roofline; cells = pairs * L * BAND)
    from isaac_aligner_tpu.ops import sw
    n_pairs = 16_384
    q = rng.integers(0, 4, (n_pairs, READ_LEN)).astype(np.int32)
    db = rng.integers(0, 4, (n_pairs, READ_LEN + sw.BAND - 1)).astype(np.int32)
    qd, dbd = jax.numpy.asarray(q), jax.numpy.asarray(db)
    out_sw = sw.banded_sw_jit(qd, dbd)
    jax.device_get(out_sw[0])           # compile + first-fetch flush
    t0 = time.time()
    reps = 4
    outs_sw = [sw.banded_sw_jit(qd, dbd)[0] for _ in range(reps)]
    jax.block_until_ready(outs_sw)
    sw_dt = time.time() - t0
    gcups = reps * n_pairs * READ_LEN * sw.BAND / sw_dt / 1e9
    print(json.dumps({
        "metric": "reads_per_sec_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
        "detail": {
            "read_len": READ_LEN,
            "batch": BATCH,
            "timed_batches": TIMED_BATCHES,
            "aligned_frac": round(aligned / total_reads, 4),
            "paired_reads_per_sec": round(paired_rps, 1),
            "banded_sw_gcups": round(gcups, 2),
            "index_build_s": round(build_s, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
