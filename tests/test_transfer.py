"""H2D transfer packing (ops/transfer): host pack ↔ device unpack."""

import jax.numpy as jnp
import numpy as np

from phyngsc_tpu.ops import transfer


def test_seq_2bit_roundtrip():
    rng = np.random.default_rng(0)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    seq = acgt[rng.integers(0, 4, size=(37, 13))]
    seq[5, 7:] = 0  # padding bytes
    mode, words = transfer.pack_seq_np(seq)
    assert mode == transfer.SEQ_2BIT
    assert words.shape[0] == transfer.n_words(37 * 13, "seq", mode)
    out = np.asarray(transfer.unpack_seq(jnp.array(words), mode, 37, 13))
    want = np.where(seq == 0, ord("A"), seq)  # padding canonicalized
    np.testing.assert_array_equal(out, want)


def test_seq_raw_fallback_on_iupac():
    seq = np.frombuffer(b"ACGTNACGTYA** ACG".replace(b" ", b"A"), np.uint8
                        ).reshape(1, -1).copy()
    mode, words = transfer.pack_seq_np(seq)
    assert mode == transfer.SEQ_RAW
    out = np.asarray(transfer.unpack_seq(jnp.array(words), mode, 1, seq.shape[1]))
    np.testing.assert_array_equal(out, seq)


def test_qual_6bit_roundtrip():
    rng = np.random.default_rng(1)
    qual = rng.integers(33, 97, size=(20, 9)).astype(np.uint8)
    qual[3, 4:] = 0
    mode, words = transfer.pack_qual_np(qual)
    assert mode == transfer.QUAL_6BIT
    out = np.asarray(transfer.unpack_qual(jnp.array(words), mode, 20, 9))
    want = np.where(qual == 0, 33, qual)
    np.testing.assert_array_equal(out, want)


def test_qual_raw_fallback_on_high_phred():
    qual = np.full((4, 7), 100, np.uint8)  # > 96
    mode, words = transfer.pack_qual_np(qual)
    assert mode == transfer.QUAL_RAW
    out = np.asarray(transfer.unpack_qual(jnp.array(words), mode, 4, 7))
    np.testing.assert_array_equal(out, qual)


def test_packed_sizes():
    # 2-bit: 16/word, 6-bit: 5/word, raw: 4/word
    assert transfer.n_words(32, "seq", transfer.SEQ_2BIT) == 2
    assert transfer.n_words(33, "seq", transfer.SEQ_2BIT) == 3
    assert transfer.n_words(10, "qual", transfer.QUAL_6BIT) == 2
    assert transfer.n_words(10, "seq", transfer.SEQ_RAW) == 3


def test_seq_2bit_exc_sparse_iupac_roundtrip():
    rng = np.random.default_rng(2)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    seq = acgt[rng.integers(0, 4, size=(300, 36))].copy()
    flat = seq.reshape(-1)
    pos = rng.choice(flat.size, 50, replace=False)  # 0.46% ambiguity
    flat[pos] = np.frombuffer(b"NYRWSKMDVHBXU.-", np.uint8)[
        rng.integers(0, 15, size=50)]
    mode, words = transfer.pack_seq_np(seq)
    assert mode == transfer.SEQ_2BIT_EXC
    # base plane + exception bucket, below the raw fallback (the minimum
    # 1024-word bucket dominates on a plane this small; real sub-blocks
    # approach the 4x base-plane reduction)
    base = transfer.n_words(seq.size, "seq", transfer.SEQ_2BIT)
    assert base < words.shape[0] <= base + 1024
    assert words.shape[0] < transfer.n_words(seq.size, "seq", transfer.SEQ_RAW)
    out = np.asarray(transfer.unpack_seq(jnp.array(words), mode, 300, 36))
    np.testing.assert_array_equal(out, seq)


def test_seq_2bit_exc_beats_3bit_on_sparse_n():
    rng = np.random.default_rng(3)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    seq = acgt[rng.integers(0, 4, size=(2000, 40))].copy()
    flat = seq.reshape(-1)
    flat[rng.choice(flat.size, 30, replace=False)] = ord("N")
    mode, words = transfer.pack_seq_np(seq)
    assert mode == transfer.SEQ_2BIT_EXC
    assert words.shape[0] < transfer.n_words(seq.size, "seq", transfer.SEQ_3BIT)
    out = np.asarray(transfer.unpack_seq(jnp.array(words), mode, 2000, 40))
    np.testing.assert_array_equal(out, seq)


def test_seq_exc_cap_falls_back_to_3bit():
    rng = np.random.default_rng(4)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    seq = acgt[rng.integers(0, 4, size=(500, 40))].copy()
    flat = seq.reshape(-1)
    k = flat.size // 32 + 1  # just above the exception-fraction cap
    flat[rng.choice(flat.size, k, replace=False)] = ord("N")
    mode, words = transfer.pack_seq_np(seq)
    assert mode == transfer.SEQ_3BIT
    out = np.asarray(transfer.unpack_seq(jnp.array(words), mode, 500, 40))
    np.testing.assert_array_equal(out, seq)


def test_seq_3bit_acgtn_roundtrip():
    import numpy as np

    from phyngsc_tpu.ops import transfer

    rng = np.random.default_rng(0)
    seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(333, 37))
    seq[5, 7:] = 0  # padding bytes
    mode, words = transfer.pack_seq_np(seq)
    assert mode == transfer.SEQ_3BIT
    assert words.shape[0] == transfer.n_words(seq.size, "seq", mode)
    # 2.5x smaller than raw (10 values per word vs 4)
    assert words.shape[0] <= transfer.n_words(seq.size, "seq", transfer.SEQ_RAW) * 0.41
    out = np.asarray(transfer.unpack_seq(words, mode, 333, 37))
    valid = seq != 0
    np.testing.assert_array_equal(out[valid], seq[valid])
