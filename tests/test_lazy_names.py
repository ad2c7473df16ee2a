"""LazyNames: the columnar read-name container the hot path rides
(io/fastq.py) — list compatibility, slicing, padding, whitespace trim."""

import numpy as np

from isaac_aligner_tpu.io.fastq import LazyNames, ReadBatch, pad_batch


def _ln(names):
    return LazyNames.from_list(names)


def test_list_compat_and_matrix():
    ln = _ln(["read1", "r2", "longer_name_x"])
    assert len(ln) == 3
    assert ln[0] == "read1" and ln[2] == "longer_name_x"
    assert list(ln) == ["read1", "r2", "longer_name_x"]
    mat, lens = ln.matrix(np.array([0, 2]))
    assert bytes(mat[0][: lens[0]]) == b"read1"
    assert bytes(mat[1][: lens[1]]) == b"longer_name_x"


def test_slicing_preserves_pad_from():
    ln = _ln(["a", "b", "c", "__pad0", "__pad1"])
    assert ln.pad_from == 3
    sl = ln[1:4]
    assert list(sl) == ["b", "c", "__pad0"]
    assert sl.pad_from == 2


def test_with_padding_and_n_valid():
    ln = LazyNames(np.frombuffer(b"xy", np.uint8).reshape(2, 1).copy(),
                   np.ones(2, np.int32))
    padded = ln.with_padding(5)
    assert len(padded) == 5 and padded.pad_from == 2
    assert padded[3] == "__pad1"
    b = ReadBatch(padded, np.zeros((5, 4), np.uint8),
                  np.zeros((5, 4), np.uint8), np.zeros(5, np.int32))
    assert b.n_valid == 2


def test_pad_batch_columnar_names():
    b = ReadBatch(_ln(["q1", "q2"]), np.zeros((2, 4), np.uint8),
                  np.zeros((2, 4), np.uint8), np.full(2, 4, np.int32))
    p = pad_batch(b, 4)
    assert isinstance(p.names, LazyNames)
    assert list(p.names) == ["q1", "q2", "__pad0", "__pad1"]
    assert p.n_valid == 2


def test_whitespace_trim_in_stream(tmp_path):
    from isaac_aligner_tpu.io.fastq import _ColumnarFastqStream
    (tmp_path / "r.fq").write_text(
        "@name1 extra comment\nACGT\n+\nIIII\n"
        "@name2\ttabbed\nACGT\n+\nIIII\n"
        "@plain\nACGT\n+\nIIII\n")
    st = _ColumnarFastqStream(tmp_path / "r.fq")
    names, bases, quals, lengths = st.next_batch(10)
    assert list(names) == ["name1", "name2", "plain"]
