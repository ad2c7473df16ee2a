"""Logging / phase timing / per-read trace tests (reference Debug.hh
ISAAC_THREAD_CERR + ISAAC_THREAD_CERR_DEV_TRACE_CLUSTER_ID analogs)."""

import numpy as np

from isaac_aligner_tpu.utils import tracing


def test_log_and_phase(capsys):
    tracing.enable_logging(True)
    try:
        with tracing.phase("unit-phase"):
            tracing.log("inside")
    finally:
        tracing.enable_logging(False)
    err = capsys.readouterr().err
    assert "unit-phase: start" in err
    assert "inside" in err
    assert "unit-phase: done" in err


def test_trace_batch_prints_selected_read(capsys):
    res = {
        "aligned": np.array([True, True]),
        "start": np.array([100, 200]),
        "mapq": np.array([60, 12]),
        "cand_start": np.array([[100, -1], [200, 205]]),
        "cand_valid": np.array([[True, False], [True, True]]),
        "cand_mismatches": np.array([[0, 0], [1, 3]]),
    }
    tracing.set_trace_reads(["readB"])
    try:
        tracing.trace_batch(["readA", "readB"], res)
    finally:
        tracing.set_trace_reads(None)
    err = capsys.readouterr().err
    assert "readB" in err and "readA" not in err
    assert "start = 200" in err
    assert "candidates[2]" in err
    assert "(start=200, mm=1)" in err


def test_trace_inactive_is_silent(capsys):
    tracing.set_trace_reads(None)
    tracing.trace_batch(["r"], {"aligned": np.array([True])})
    assert capsys.readouterr().err == ""


def test_aligner_trace_end_to_end(capsys):
    from isaac_aligner_tpu.aligner import Aligner
    from isaac_aligner_tpu.index.build import build_index
    from isaac_aligner_tpu.io.fasta import genome_from_sequences
    from isaac_aligner_tpu.io.fastq import ReadBatch

    rng = np.random.default_rng(1)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    genome = genome_from_sequences([("c", seq)])
    index = build_index(genome, seed_len=32)
    bases = genome.codes[500:564][None, :].astype(np.uint8)
    batch = ReadBatch(names=["traced"], bases=bases,
                      quals=np.full(bases.shape, 30, np.uint8),
                      lengths=np.array([64], np.int32))
    tracing.set_trace_reads(["traced"])
    try:
        al = Aligner.create(index, read_len=64, base_quality_cutoff=0)
        al.align_to_sam(batch)
    finally:
        tracing.set_trace_reads(None)
    err = capsys.readouterr().err
    assert "TRACE read 'traced'" in err
    assert "start = 500" in err
