import jax.numpy as jnp
import numpy as np
import pytest

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.models import dna
from phyngsc_tpu.utils.bitio import BitReader, BitWriter

CFG = CodecConfig()
LUT_BITS = CFG.max_code_len
G = 8


def full_roundtrip(seq, qual, lens):
    """encode (transfer → plan → pack → header) then decode (header → unpack
    → restore) and return (seq', qual')."""
    R, L = seq.shape
    seq_j, qual_j, lens_j = jnp.array(seq), jnp.array(qual), jnp.array(lens)
    qual_t, keep, _ = dna.transfer_ambiguity(seq_j, qual_j, lens_j)
    counts = dna.analyze(seq_j, keep)
    p = dna.plan(np.asarray(counts), CFG)
    words, sub_n_words, total_words = dna.encode_device(
        seq_j, keep, jnp.array(p.codes_tab), jnp.array(p.lens_tab),
        p.mode, G, R * L,
    )
    bw = BitWriter()
    dna.write_header(bw, p, np.asarray(sub_n_words), int(total_words), False)
    bw.flush()
    p2, sub_n_words2, total_words2, is_delta = dna.read_header(BitReader(bw.getvalue()))
    assert p2.mode == p.mode and not is_delta
    np.testing.assert_array_equal(p2.lens_tab, p.lens_tab)

    # decode side: keep mask is derived from the decoded quality stream
    keep_dec = (np.asarray(qual_t) < 128) & (np.arange(L)[None, :] < lens[:, None])
    np.testing.assert_array_equal(keep_dec, np.asarray(keep))
    w = words[: int(total_words)]
    if p2.mode == dna.MODE_PLAIN:
        dna_syms = dna.decode_plain(w, jnp.array(sub_n_words2), jnp.array(keep_dec), L, G)
    else:
        dna_syms = dna.decode_huffman(
            w, jnp.array(sub_n_words2), jnp.array(keep_dec),
            jnp.array(p2.luts(LUT_BITS)), L, G, LUT_BITS,
        )
    seq_out, qual_out = dna.restore_ambiguity(dna_syms, qual_t, lens_j)
    return np.asarray(seq_out), np.asarray(qual_out)


def test_pure_acgt_plain_mode():
    rng = np.random.default_rng(0)
    R, L = 32, 36
    seq = dna.ACGT[rng.integers(0, 4, size=(R, L))]
    qual = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    lens = np.full(R, L, dtype=np.int32)
    counts = dna.analyze(jnp.array(seq), jnp.array(np.ones((R, L), bool)))
    assert dna.plan(np.asarray(counts), CFG).mode == dna.MODE_PLAIN
    s, q = full_roundtrip(seq, qual, lens)
    np.testing.assert_array_equal(s, seq)
    np.testing.assert_array_equal(q, qual)


def test_ambiguity_transfer_roundtrip():
    rng = np.random.default_rng(1)
    R, L = 32, 36
    seq = dna.ACGT[rng.integers(0, 4, size=(R, L))]
    qual = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    amb = rng.random((R, L)) < 0.05
    iupac = np.frombuffer(b"YRWSKMDVHBNXU.-", dtype=np.uint8)
    seq = seq.copy()
    seq[amb] = iupac[rng.integers(0, 15, size=int(amb.sum()))]
    qual[amb] = rng.integers(33, 41, size=int(amb.sum())).astype(np.uint8)
    lens = np.full(R, L, dtype=np.int32)
    s, q = full_roundtrip(seq, qual, lens)
    np.testing.assert_array_equal(s, seq)
    np.testing.assert_array_equal(q, qual)


def test_transfer_blocked_by_bad_quality():
    # ambiguous base with quality outside [33,40] → record not transferred,
    # IUPAC symbol stays in DNA stream → huffman mode
    rng = np.random.default_rng(2)
    R, L = 16, 20
    seq = dna.ACGT[rng.integers(0, 4, size=(R, L))]
    qual = np.full((R, L), 60, dtype=np.uint8)
    seq[3, 5] = ord("N")  # quality 60 > 40 → no transfer
    lens = np.full(R, L, dtype=np.int32)
    qual_t, keep, transferred = dna.transfer_ambiguity(
        jnp.array(seq), jnp.array(qual), jnp.array(lens)
    )
    assert not bool(np.asarray(transferred)[3])
    assert bool(np.asarray(keep)[3, 5])  # N stays in stream
    s, q = full_roundtrip(seq, qual, lens)
    np.testing.assert_array_equal(s, seq)
    np.testing.assert_array_equal(q, qual)


def test_mixed_transfer_per_record():
    # record 0 transferable, record 1 not (unknown symbol), both round-trip
    seq = np.frombuffer(b"ACGTNACG" + b"ACGTZACG", dtype=np.uint8).reshape(2, 8).copy()
    qual = np.full((2, 8), 35, dtype=np.uint8)
    lens = np.full(2, 8, dtype=np.int32)
    # pad records to G
    seq = np.vstack([seq] + [seq[-1:]] * 6)
    qual = np.vstack([qual] + [qual[-1:]] * 6)
    lens = np.full(8, 8, dtype=np.int32)
    s, q = full_roundtrip(seq, qual, lens)
    np.testing.assert_array_equal(s, seq)
    np.testing.assert_array_equal(q, qual)


def test_variable_lengths():
    rng = np.random.default_rng(3)
    R, L = 24, 30
    lens = rng.integers(1, L + 1, size=R).astype(np.int32)
    v = np.arange(L)[None, :] < lens[:, None]
    seq = dna.ACGT[rng.integers(0, 4, size=(R, L))]
    seq[~v] = 0
    qual = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    qual[~v] = 0
    s, q = full_roundtrip(seq, qual, lens)
    np.testing.assert_array_equal(s, seq)
    np.testing.assert_array_equal(q, qual)


def test_delta_detect_and_translate_roundtrip():
    rng = np.random.default_rng(4)
    R, L = 16, 20
    colors = rng.integers(0, 4, size=(R, L - 1)).astype(np.uint8) + ord("0")
    head = dna.ACGT[rng.integers(0, 4, size=(R, 1))]
    seq = np.hstack([head, colors])
    lens = np.full(R, L, dtype=np.int32)
    assert dna.detect_delta(seq, lens)
    nucs = dna.delta_translate(jnp.array(seq), jnp.array(lens))
    n = np.asarray(nucs)
    assert set(np.unique(n[:, 1:])) <= set(dna.ACGT.tolist())
    back = dna.delta_untranslate(nucs, jnp.array(lens))
    np.testing.assert_array_equal(np.asarray(back), seq)


def test_delta_not_detected_for_dot_colors():
    # '.' colors are not invertible → delta must NOT engage
    seq = np.frombuffer(b"T0.1201230", dtype=np.uint8)[None, :].repeat(4, 0).copy()
    lens = np.full(4, 10, dtype=np.int32)
    assert not dna.detect_delta(seq, lens)


def test_delta_not_detected_for_normal_reads():
    rng = np.random.default_rng(5)
    seq = dna.ACGT[rng.integers(0, 4, size=(8, 36))]
    lens = np.full(8, 36, dtype=np.int32)
    assert not dna.detect_delta(seq, lens)
