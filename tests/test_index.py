import numpy as np
import pytest

from isaac_aligner_tpu import dna
from isaac_aligner_tpu.index.build import (
    SeedIndex, build_index, TOO_MANY_POS, bias_u32_to_i32, unbias_i32_to_u32)
from isaac_aligner_tpu.io.fasta import genome_from_sequences


def _kmer_u32(seq: str) -> int:
    return dna.pack_kmer(dna.encode(seq))


def test_bias_preserves_order():
    xs = np.array([0, 1, 2**31 - 1, 2**31, 2**32 - 1], dtype=np.uint32)
    b = bias_u32_to_i32(xs)
    assert np.all(np.diff(b.astype(np.int64)) > 0)
    assert np.array_equal(unbias_i32_to_u32(b), xs)


def test_build_index_simple_16():
    genome = genome_from_sequences([("c1", "ACGTACGTACGTACGTACGT")])  # len 20
    idx = build_index(genome, seed_len=16, repeat_threshold=1000)
    # 5 windows, all valid
    assert idx.num_records == 5
    # sorted keys
    keys = unbias_i32_to_u32(idx.key_hi).astype(np.int64)
    assert np.all(np.diff(keys) >= 0)
    # every record's kmer matches the genome at its position
    for hi, pos in zip(unbias_i32_to_u32(idx.key_hi), idx.pos):
        window = genome.codes[pos : pos + 16]
        assert dna.pack_kmer(window) == int(hi)


def test_index_excludes_n_windows_and_contig_straddle():
    genome = genome_from_sequences([
        ("c1", "ACGTACGTACGTACGTAAAA"),   # 20b
        ("c2", "TTTTACGTACGTACGTACGT"),   # 20b
    ])
    idx = build_index(genome, seed_len=16)
    # no position in 5..19 (would straddle contigs); c2 starts at offset 20
    assert not np.any((idx.pos > 4) & (idx.pos < 20))

    genome_n = genome_from_sequences([("c1", "ACGTACGTNACGTACGTACGTACG")])
    idx_n = build_index(genome_n, seed_len=16)
    # windows overlapping position 8 (the N) are excluded
    for pos in idx_n.pos:
        assert not (pos <= 8 < pos + 16)


def test_repeat_collapse():
    # 'A'*40 has many identical AAAA... kmers
    genome = genome_from_sequences([("c1", "A" * 40 + "ACGTTGCAACGTTGCA")])
    idx = build_index(genome, seed_len=16, repeat_threshold=3)
    # the all-A kmer occurs 25 times > 3 -> collapsed into one sentinel
    all_a = _kmer_u32("A" * 16)
    keys = unbias_i32_to_u32(idx.key_hi)
    mask = keys == all_a
    assert mask.sum() == 1
    assert idx.pos[mask][0] == TOO_MANY_POS
    assert idx.collapsed_kmers >= 1


def test_save_load_roundtrip(tmp_path):
    genome = genome_from_sequences([("c1", "ACGTACGTACGTACGTACGTACGTACGTACGT")])
    idx = build_index(genome, seed_len=16)
    idx.save(tmp_path / "index")
    idx2 = SeedIndex.load(tmp_path / "index")
    assert idx2.seed_len == idx.seed_len
    assert np.array_equal(idx2.key_hi, idx.key_hi)
    assert np.array_equal(idx2.pos, idx.pos)
    assert idx2.genome.contigs[0].name == "c1"


def test_build_index_32mer():
    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    genome = genome_from_sequences([("c1", seq)])
    idx = build_index(genome, seed_len=32)
    assert idx.num_records == 200 - 32 + 1
    # spot check a record against pack_kmer of hi/lo halves
    i = 57
    hi = unbias_i32_to_u32(idx.key_hi)[i]
    lo = unbias_i32_to_u32(idx.key_lo)[i]
    p = idx.pos[i]
    assert dna.pack_kmer(genome.codes[p : p + 16]) == hi
    assert dna.pack_kmer(genome.codes[p + 16 : p + 32]) == lo


# -- streaming (bounded-memory) build --------------------------------------

def _random_genome(rng, contig_lens, n_rate=0.01, repeat_block=None):
    seqs = []
    for i, ln in enumerate(contig_lens):
        codes = rng.integers(0, 4, ln)
        codes[rng.random(ln) < n_rate] = 4  # N
        seq = "".join("ACGTN"[c] for c in codes)
        if repeat_block and i == 0:
            seq = repeat_block * (ln // len(repeat_block))
        seqs.append((f"c{i}", seq))
    return genome_from_sequences(seqs)


@pytest.mark.parametrize("seed_len", [16, 32])
def test_streaming_build_matches_in_ram(tmp_path, seed_len):
    from isaac_aligner_tpu.index.build import build_index_streaming

    rng = np.random.default_rng(7)
    genome = _random_genome(rng, [5000, 3000, 120])
    ram = build_index(genome, seed_len=seed_len, repeat_threshold=1000)
    st = build_index_streaming(genome, tmp_path / "idx", seed_len=seed_len,
                               repeat_threshold=1000, mask_width=4,
                               chunk_windows=777)
    assert st.total_kmers == ram.total_kmers
    assert st.collapsed_kmers == ram.collapsed_kmers
    assert np.array_equal(np.asarray(st.key_hi), ram.key_hi)
    assert np.array_equal(np.asarray(st.key_lo), ram.key_lo)
    assert np.array_equal(np.asarray(st.pos), ram.pos)
    # persisted layout loads like any other index
    reloaded = SeedIndex.load(tmp_path / "idx")
    assert np.array_equal(reloaded.pos, ram.pos)


def test_streaming_build_repeat_collapse(tmp_path):
    from isaac_aligner_tpu.index.build import build_index_streaming

    rng = np.random.default_rng(3)
    # contig 0 is a pure repeat of a 40-mer: its 32-mers exceed threshold
    genome = _random_genome(rng, [4000, 2000], n_rate=0.0,
                            repeat_block="ACGTACGGTTCAGATTACAGATTACAGGGCATTACGAATC")
    ram = build_index(genome, seed_len=32, repeat_threshold=5)
    st = build_index_streaming(genome, tmp_path / "idx", seed_len=32,
                               repeat_threshold=5, mask_width=3,
                               chunk_windows=513)
    assert st.collapsed_kmers == ram.collapsed_kmers > 0
    assert np.array_equal(np.asarray(st.pos), ram.pos)
    assert np.array_equal(np.asarray(st.key_hi), ram.key_hi)
    # sentinel records present
    assert np.any(np.asarray(st.pos) == TOO_MANY_POS)


def test_streaming_build_cli_annotate(tmp_path):
    from isaac_aligner_tpu.index.build import build_index_streaming

    rng = np.random.default_rng(11)
    genome = _random_genome(rng, [2000], n_rate=0.0)
    ram = build_index(genome, seed_len=32, annotate_neighbors=True)
    st = build_index_streaming(genome, tmp_path / "idx", seed_len=32,
                               annotate_neighbors=True, mask_width=2)
    assert st.has_neighbors is not None
    assert np.array_equal(np.asarray(st.has_neighbors), ram.has_neighbors)
    reloaded = SeedIndex.load(tmp_path / "idx", mmap=True)
    assert np.array_equal(np.asarray(reloaded.has_neighbors), ram.has_neighbors)
