"""Fuzz robustness (SURVEY §4 layering (b)/(e) extended).

1. Corrupted containers: any single bit/byte flip must either decode to the
   exact original (flip hit unused padding / cap slack) or raise a clean
   error (crc mismatch, framing error) — never crash the process, hang, or
   silently return different bytes (the per-sub-block crc32 covers every
   decoded byte).
2. Property fuzz: randomized records (lengths, IUPAC density, quality
   extremes, messy titles) must round-trip byte-exactly.
"""

import numpy as np
import pytest

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.pipeline.compress import compress_bytes
from phyngsc_tpu.pipeline.decompress import decompress_bytes

CFG = CodecConfig(subblock_input_bytes=16 << 10, records_per_substream=8)

#: every acceptable "clean rejection" for corrupt input: DESIGNED rejections
#: only (container framing/range ValueErrors, BitReader EOFError) — crashes
#: escaping from numpy internals (IndexError/KeyError/OverflowError) are
#: bugs, not rejections (VERDICT r2 weak #4)
CORRUPT_ERRORS = (ValueError, EOFError)


def _random_fastq(rng: np.random.Generator, n: int, *, iupac=0.0,
                  qmax=74, var_len=True, messy_titles=False) -> bytes:
    alphabet = b"ACGT" + (b"NYRWSKM" if iupac else b"")
    probs = None
    if iupac:
        probs = np.full(len(alphabet), iupac / (len(alphabet) - 4))
        probs[:4] = (1 - iupac) / 4
    out = bytearray()
    for i in range(n):
        L = int(rng.integers(1, 80)) if var_len else 36
        if messy_titles:
            tl = int(rng.integers(1, 30))
            title = bytes(rng.integers(33, 127, size=tl).astype(np.uint8))
            title = b"@" + title.replace(b"\n", b"_")
        else:
            title = b"@FUZZ.%d run=%d" % (i, int(rng.integers(0, 9)))
        seq = rng.choice(np.frombuffer(alphabet, np.uint8), size=L, p=probs)
        qual = rng.integers(33, qmax + 1, size=L).astype(np.uint8)
        out += title + b"\n" + seq.tobytes() + b"\n+\n" + qual.tobytes() + b"\n"
    return bytes(out)


def test_bitflip_fuzz_never_crashes():
    rng = np.random.default_rng(1234)
    data = _random_fastq(rng, 120, iupac=0.02)
    blob = compress_bytes(data, CFG, 2)
    n = len(blob)
    outcomes = {"ok": 0, "rejected": 0}
    for trial in range(120):
        pos = int(rng.integers(0, n))
        bit = int(rng.integers(0, 8))
        mutated = bytearray(blob)
        mutated[pos] ^= 1 << bit
        try:
            back = decompress_bytes(bytes(mutated))
        except CORRUPT_ERRORS:
            outcomes["rejected"] += 1
            continue
        assert back == data, (
            f"silent corruption: flip at byte {pos} bit {bit} decoded "
            "different bytes without an error")
        outcomes["ok"] += 1
    # sanity: the fuzz actually hit live data, not only padding
    assert outcomes["rejected"] > 0


def test_truncation_fuzz_never_crashes():
    rng = np.random.default_rng(99)
    data = _random_fastq(rng, 60)
    blob = compress_bytes(data, CFG, 1)
    for cut in sorted(set(int(rng.integers(1, len(blob))) for _ in range(25))):
        try:
            back = decompress_bytes(blob[:cut])
        except CORRUPT_ERRORS:
            continue
        assert back == data


@pytest.mark.parametrize("seed", range(6))
def test_property_roundtrip_fuzz(seed):
    rng = np.random.default_rng(seed)
    data = _random_fastq(
        rng, int(rng.integers(20, 200)),
        iupac=float(rng.choice([0.0, 0.05, 0.4])),
        qmax=int(rng.choice([40, 74, 126])),
        var_len=bool(rng.integers(0, 2)),
        messy_titles=bool(rng.integers(0, 2)),
    )
    blob = compress_bytes(data, CFG, int(rng.integers(1, 4)))
    assert decompress_bytes(blob) == data


def test_corrupt_tables_rejected_at_parse(monkeypatch):
    """Table validation lives in _decode_parse (ADVICE r4): corrupt code
    lengths (13-16 — representable on the wire, never emitted) and
    out-of-range singleton symbols raise ValueError BEFORE any decode
    branch (fused blob, mesh shard, CPU pairs) can consume them."""
    from phyngsc_tpu.models import quality
    from phyngsc_tpu.ops import bitpack
    from phyngsc_tpu.pipeline import subblock

    cfg = CodecConfig()
    good = np.zeros((2, 256), np.uint8)
    good[:, 65:69] = 2
    # code length beyond the codec cap
    bad_len = good.copy()
    bad_len[1, 70] = cfg.max_code_len + 1
    with pytest.raises(ValueError, match="code length"):
        subblock._check_tables(bad_len, np.array([-1, -1]), "quality", cfg)
    # singleton symbol outside the 256-symbol alphabet
    with pytest.raises(ValueError, match="singleton"):
        subblock._check_tables(good, np.array([-1, 300]), "quality", cfg)
    subblock._check_tables(good, np.array([-1, -1]), "quality", cfg)

    # wire-form packer contract: length 16 (nibble+1 ceiling) is ValueError,
    # not AssertionError, and survives python -O
    worst = np.zeros((1, 256), np.uint8)
    worst[0, 0] = 16
    with pytest.raises(ValueError, match="code length"):
        bitpack.pack_lens4_np(worst, np.array([-1], np.int32))

    # end-to-end: a corrupt table surfacing from read_header is rejected at
    # parse time on EVERY decode path, including the sharded-mesh branch
    data = _random_fastq(np.random.default_rng(7), 40, var_len=False)
    blob = compress_bytes(data, CFG, 1)
    orig = quality.read_header

    def poison(br):
        tables, sub, total = orig(br)
        tables.lens[0, tables.lens[0].argmax()] = cfg.max_code_len + 2
        return tables, sub, total

    monkeypatch.setattr(quality, "read_header", poison)
    with pytest.raises(ValueError, match="corrupt quality table"):
        decompress_bytes(blob)
