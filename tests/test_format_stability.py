"""Container format stability + corruption handling (SURVEY §4 layering (e)).

The golden blob pins the on-disk format: if encoding changes byte layout,
this test fails and the format version must be bumped (footer VERSION) with
a migration note — silent format drift would strand existing .ngsct files.
"""

import os

import numpy as np
import pytest

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.container import footer as footermod
from phyngsc_tpu.pipeline.compress import compress_bytes
from phyngsc_tpu.pipeline.decompress import decompress_bytes
from phyngsc_tpu.utils.fastq import synthesize_fastq

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_v1.ngsct")
CFG = CodecConfig(subblock_input_bytes=32 << 10, records_per_substream=16)


def _golden_input() -> bytes:
    return synthesize_fastq(300, read_len=36, seed=99)


def test_golden_decodes():
    """A container produced by an earlier build must keep decoding byte-exact."""
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "wb") as f:
            f.write(compress_bytes(_golden_input(), CFG, 2))
    with open(GOLDEN, "rb") as f:
        blob = f.read()
    assert decompress_bytes(blob) == _golden_input()


def test_truncated_container_rejected():
    blob = compress_bytes(_golden_input(), CFG, 1)
    with pytest.raises(ValueError):
        decompress_bytes(blob[: len(blob) // 2])


def test_corrupt_footer_length_rejected():
    blob = bytearray(compress_bytes(_golden_input(), CFG, 1))
    blob[-6] ^= 0xFF  # footer length bytes
    with pytest.raises((ValueError, EOFError)):
        decompress_bytes(bytes(blob))


def test_wrong_magic_rejected():
    blob = bytearray(compress_bytes(_golden_input(), CFG, 1))
    blob[-1] ^= 0x55
    with pytest.raises(ValueError):
        decompress_bytes(bytes(blob))


def test_version_field_checked():
    data = _golden_input()
    blob = bytearray(compress_bytes(data, CFG, 1))
    foot_len = int.from_bytes(blob[-8:-4], "big")
    version_off = len(blob) - 8 - foot_len
    blob[version_off] = 99
    with pytest.raises(ValueError, match="version"):
        decompress_bytes(bytes(blob))


def test_checksum_catches_payload_corruption():
    """Flip a bit inside a block payload: decoding must either raise or —
    never — silently return wrong bytes."""
    data = _golden_input()
    blob = bytearray(compress_bytes(data, CFG, 1))
    # corrupt a byte well inside the first block's payload
    blob[600] ^= 0x40
    try:
        out = decompress_bytes(bytes(blob))
    except Exception:
        return  # any loud failure is acceptable
    assert out == data, "corruption produced silently wrong output"


def test_golden_v2_decodes():
    """v2 (crc-bearing) golden container."""
    golden2 = os.path.join(os.path.dirname(__file__), "golden", "tiny_v2.ngsct")
    if not os.path.exists(golden2):
        with open(golden2, "wb") as f:
            f.write(compress_bytes(_golden_input(), CFG, 2))
    with open(golden2, "rb") as f:
        blob = f.read()
    assert decompress_bytes(blob) == _golden_input()
