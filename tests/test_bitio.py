import pytest

from phyngsc_tpu.utils.bitio import BitReader, BitWriter, bit_length


def test_bit_length():
    assert bit_length(0) == 1
    assert bit_length(1) == 1
    assert bit_length(2) == 2
    assert bit_length(255) == 8
    assert bit_length(256) == 9
    assert bit_length((1 << 31) - 1) == 31


def test_roundtrip_simple():
    w = BitWriter()
    w.put_bits(0b101, 3)
    w.put_bits(0xDEAD, 16)
    w.put_bit(1)
    w.put_bits(0, 4)
    w.flush()
    r = BitReader(w.getvalue())
    assert r.get_bits(3) == 0b101
    assert r.get_bits(16) == 0xDEAD
    assert r.get_bit() == 1
    assert r.get_bits(4) == 0


def test_msb_first_layout():
    w = BitWriter()
    w.put_bits(0b1, 1)
    w.put_bits(0b0000000, 7)
    w.flush()
    assert w.getvalue() == b"\x80"  # MSB-first within a byte


def test_uint_big_endian():
    w = BitWriter()
    w.put_uint(0x01020304, 4)
    w.flush()
    assert w.getvalue() == b"\x01\x02\x03\x04"
    r = BitReader(w.getvalue())
    assert r.get_uint(4) == 0x01020304


def test_bytes_and_align():
    w = BitWriter()
    w.put_bits(0b11, 2)
    w.flush()
    w.put_bytes(b"hello")
    out = w.getvalue()
    r = BitReader(out)
    assert r.get_bits(2) == 0b11
    r.align()
    assert r.get_bytes(5) == b"hello"
    assert r.exhausted


def test_random_roundtrip():
    import random

    rng = random.Random(1234)
    fields = [(rng.randrange(1 << n), n) for n in rng.choices(range(1, 33), k=500)]
    w = BitWriter()
    for v, n in fields:
        w.put_bits(v, n)
    w.flush()
    r = BitReader(w.getvalue())
    for v, n in fields:
        assert r.get_bits(n) == v


def test_overflow_rejected():
    w = BitWriter()
    with pytest.raises(ValueError):
        w.put_bits(4, 2)


def test_unflushed_rejected():
    w = BitWriter()
    w.put_bits(1, 3)
    with pytest.raises(ValueError):
        w.getvalue()


def test_eof():
    r = BitReader(b"\xff")
    r.get_bits(8)
    with pytest.raises(EOFError):
        r.get_bit()
