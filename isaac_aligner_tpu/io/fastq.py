"""FASTQ reading into fixed-shape read batches.

Reference analog: src/c++/include/io/FastqReader.hh and the FastqSeedSource
tile synthesis (src/c++/include/workflow/alignWorkflow/FastqDataSource.hh).
The TPU pipeline wants rectangular [batch, read_len] uint8 arrays; reads
shorter than read_len are padded with N / quality 0 (padding bases never
match and carry no probability mass), longer reads are an error for now.
"""

from __future__ import annotations

import dataclasses
import gzip
import io
from pathlib import Path

import numpy as np

from .. import dna


@dataclasses.dataclass
class ReadBatch:
    """A rectangular batch of reads (one 'tile' in reference terms)."""

    names: list[str]
    bases: np.ndarray    # uint8 [B, L] codes 0..4
    quals: np.ndarray    # uint8 [B, L] phred (0 for padding)
    lengths: np.ndarray  # int32 [B] true read lengths

    @property
    def count(self) -> int:
        return int(self.bases.shape[0])

    @property
    def read_len(self) -> int:
        return int(self.bases.shape[1])


def _open_maybe_gzip(path: str | Path) -> io.BufferedReader:
    f = open(Path(path), "rb")
    if f.peek(2)[:2] == b"\x1f\x8b":
        return gzip.open(f)  # type: ignore[return-value]
    return f


def read_fastq(path: str | Path, phred_offset: int = 33) -> ReadBatch:
    names: list[str] = []
    seqs: list[bytes] = []
    quals: list[bytes] = []
    with _open_maybe_gzip(path) as f:
        while True:
            header = f.readline()
            if not header:
                break
            header = header.strip()
            if not header:
                continue
            if not header.startswith(b"@"):
                raise ValueError(f"{path}: malformed FASTQ header {header!r}")
            seq = f.readline().strip()
            plus = f.readline().strip()
            qual = f.readline().strip()
            if not plus.startswith(b"+"):
                raise ValueError(f"{path}: malformed FASTQ separator {plus!r}")
            if len(seq) != len(qual):
                raise ValueError(f"{path}: seq/qual length mismatch for {header!r}")
            names.append(header[1:].split()[0].decode("ascii"))
            seqs.append(seq)
            quals.append(qual)
    return batch_from_reads(names, seqs, quals, phred_offset=phred_offset)


def batch_from_reads(
    names: list[str],
    seqs: list[str | bytes],
    quals: list[str | bytes] | None = None,
    phred_offset: int = 33,
    default_q: int = 30,
) -> ReadBatch:
    """Build a rectangular ReadBatch from python read lists (fixture entry)."""
    seqs_b = [s.encode("ascii") if isinstance(s, str) else bytes(s) for s in seqs]
    n = len(seqs_b)
    max_len = max((len(s) for s in seqs_b), default=0)
    bases = np.full((n, max_len), dna.N, dtype=np.uint8)
    q = np.zeros((n, max_len), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(seqs_b):
        bases[i, : len(s)] = dna.encode(s)
        lengths[i] = len(s)
        if quals is not None:
            qi = quals[i]
            qi = qi.encode("ascii") if isinstance(qi, str) else bytes(qi)
            q[i, : len(s)] = np.frombuffer(qi, dtype=np.uint8) - phred_offset
        else:
            q[i, : len(s)] = default_q
    return ReadBatch(names=names, bases=bases, quals=q, lengths=lengths)


def pad_batch(batch: ReadBatch, to_count: int) -> ReadBatch:
    """Pad a batch with empty reads up to a static batch size (XLA wants
    a small set of distinct shapes so compiled executables are reused)."""
    b = batch.count
    if b == to_count:
        return batch
    if b > to_count:
        raise ValueError("pad_batch cannot shrink")
    pad = to_count - b
    return ReadBatch(
        names=batch.names + [f"__pad{i}" for i in range(pad)],
        bases=np.concatenate([batch.bases, np.full((pad, batch.read_len), dna.N, np.uint8)]),
        quals=np.concatenate([batch.quals, np.zeros((pad, batch.read_len), np.uint8)]),
        lengths=np.concatenate([batch.lengths, np.zeros(pad, np.int32)]),
    )
