import numpy as np
import pytest

from phyngsc_tpu.utils.bitio import (BitReader, BitWriter, get_uint_array,
                                     put_uint_array)
from phyngsc_tpu.utils.shapes import bucket_length, bucket_records


def test_uint_array_roundtrip():
    rng = np.random.default_rng(0)
    for width in (1, 4, 7, 13, 20):
        vals = rng.integers(0, 1 << width, size=137).astype(np.int64)
        w = BitWriter()
        w.put_bits(0b101, 3)  # misaligned start
        put_uint_array(w, vals, width)
        w.put_bits(0b11, 2)
        w.flush()
        r = BitReader(w.getvalue())
        assert r.get_bits(3) == 0b101
        np.testing.assert_array_equal(get_uint_array(r, 137, width), vals)
        assert r.get_bits(2) == 0b11


def test_uint_array_empty():
    w = BitWriter()
    put_uint_array(w, np.zeros(0, np.int64), 8)
    w.flush()
    assert w.getvalue() == b""
    assert get_uint_array(BitReader(b""), 0, 8).shape == (0,)


def test_uint_array_matches_scalar_writes():
    vals = [3, 0, 7, 5, 1]
    w1 = BitWriter()
    put_uint_array(w1, np.array(vals), 3)
    w1.flush()
    w2 = BitWriter()
    for v in vals:
        w2.put_bits(v, 3)
    w2.flush()
    assert w1.getvalue() == w2.getvalue()


def test_bucket_records_properties():
    for R in (1, 100, 511, 512, 513, 4097, 65536):
        for G in (8, 64):
            for sh in (1, 4):
                Rp = bucket_records(R, G, sh)
                assert Rp >= R
                assert Rp % (G * sh) == 0
    # determinism / stability: two nearby sizes share a bucket
    assert bucket_records(60000, 64) == bucket_records(65000, 64)


def test_bucket_length():
    assert bucket_length(36) == 36
    assert bucket_length(1) == 4
    assert bucket_length(77) == 80


def test_group_codes_matches_pairs():
    import jax.numpy as jnp

    from phyngsc_tpu.ops.lookup import group_codes, pair_codes

    rng = np.random.default_rng(1)
    # k=3 grouping below requires k * max_len <= 32 → lens <= 10
    lens = rng.integers(0, 11, size=(8, 12)).astype(np.int32)
    codes = np.array([[rng.integers(0, 1 << max(l, 1)) for l in row] for row in lens],
                     dtype=np.uint32)
    codes[lens == 0] = 0  # grouping precondition: zero-length ⇒ zero code
    c2, l2 = pair_codes(jnp.array(codes), jnp.array(lens))
    c2b, l2b = group_codes(jnp.array(codes), jnp.array(lens), 2)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c2b))
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(l2b))
    # grouping preserves the emitted bit string
    from phyngsc_tpu.ops.bitpack import pack_bits_scatter_np, substream_layout_np

    lay1 = substream_layout_np(lens, 8)
    w1 = pack_bits_scatter_np(codes, lens, lay1["bit_offsets"], lay1["total_words"] or 1)
    c3, l3 = (np.asarray(x) for x in group_codes(jnp.array(codes), jnp.array(lens), 3))
    lay3 = substream_layout_np(l3, 8)
    w3 = pack_bits_scatter_np(c3, l3, lay3["bit_offsets"], lay3["total_words"] or 1)
    np.testing.assert_array_equal(w1, w3)
