import numpy as np

from isaac_aligner_tpu import dna


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = dna.encode(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert dna.decode(codes) == "ACGTNACGTN"


def test_revcomp():
    assert dna.decode(dna.revcomp(dna.encode("ACGTN"))) == "NACGT"
    # double revcomp is identity
    s = dna.encode("GATTACAN")
    assert np.array_equal(dna.revcomp(dna.revcomp(s)), s)


def test_pack_kmer_order_is_lexicographic():
    a = dna.pack_kmer(dna.encode("AAAC"))
    b = dna.pack_kmer(dna.encode("AAAG"))
    c = dna.pack_kmer(dna.encode("AACA"))
    assert a < b < c


def test_pack_unpack_roundtrip():
    codes = dna.encode("ACGTACGTACGTACGT")
    v = dna.pack_kmer(codes)
    assert np.array_equal(dna.unpack_kmer(v, 16), codes)
