"""`.ngsc` exporter round-trips through the (reference-verified) importer.

The importer (container/ngsc_import.py) is proven byte-exact against the
compiled reference binary (test_ngsc_import.py), so export → import
byte-identity demonstrates the store-side semantics of tasks.cpp:289-622 /
1104-1200 are fully understood (VERDICT r3 next #7)."""

import numpy as np
import pytest

from phyngsc_tpu.container import ngsc_export, ngsc_import
from phyngsc_tpu.utils.fastq import synthesize_fastq


def _roundtrip(data: bytes, **kw) -> None:
    blob = ngsc_export.export_ngsc(data, **kw)
    assert ngsc_import.decompress_ngsc(blob) == data


def test_export_err_style():
    _roundtrip(synthesize_fastq(600, read_len=36, seed=1))


def test_export_srr_style():
    _roundtrip(synthesize_fastq(400, read_len=76, style="SRR", seed=2))


def test_export_with_ambiguity_transfer():
    """IUPAC symbols with low qualities transfer into the quality stream
    (phyNGSC.cpp:552-588) and restore on import."""
    rng = np.random.default_rng(3)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    amb = np.frombuffer(b"NYRWSKMDVHB", np.uint8)
    recs = []
    for i in range(300):
        seq = acgt[rng.integers(0, 4, size=36)].copy()
        qual = rng.integers(33, 41, size=36).astype(np.uint8)  # transferable
        for _ in range(int(rng.integers(0, 4))):
            seq[rng.integers(0, 36)] = amb[rng.integers(0, len(amb))]
        recs.append(b"@amb.%d x%d\n" % (i, i * 3) + seq.tobytes()
                    + b"\n+\n" + qual.tobytes() + b"\n")
    _roundtrip(b"".join(recs))


def test_export_nontransferable_ambiguity():
    """High-quality IUPAC stays in the DNA stream (Huffman mode)."""
    rng = np.random.default_rng(4)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(200):
        seq = acgt[rng.integers(0, 4, size=30)].copy()
        seq[rng.integers(0, 30)] = ord("N")
        qual = np.full(30, ord("I"), np.uint8)   # 73 > 40: no transfer
        recs.append(b"@n.%d\n" % i + seq.tobytes() + b"\n+\n"
                    + qual.tobytes() + b"\n")
    _roundtrip(b"".join(recs))


def test_export_variable_lengths():
    rng = np.random.default_rng(5)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(250):
        n = int(rng.integers(15, 60))
        seq = acgt[rng.integers(0, 4, size=n)]
        qual = rng.integers(33, 70, size=n).astype(np.uint8)
        recs.append(b"@v%d some:field/%d\n" % (i, i % 7) + seq.tobytes()
                    + b"\n+\n" + qual.tobytes() + b"\n")
    _roundtrip(b"".join(recs))


def test_export_title_shapes():
    """Title edge cases: leading zeros (must NOT numeric-code), huge values,
    constant fields, block-constant runs, empty fields."""
    recs = []
    for i in range(120):
        run = i // 32
        title = (b"@SRR001.%d const 007 4294967295 x%d..y\n"
                 % (i + 1, run))
        seq = b"ACGTACGTAC"
        qual = b"IIIIIIIIII"
        recs.append(title + seq + b"\n+\n" + qual + b"\n")
    _roundtrip(b"".join(recs))


def test_export_multi_block_split(monkeypatch):
    """Sub-blocks split across block boundaries (FSBS/LSBS stitching) —
    block size shrunk so the split machinery fires without megabytes of
    pure-Python encoding; the importer walks headers, so the same code
    paths are exercised as at 8 MiB."""
    monkeypatch.setattr(ngsc_export, "BLOCK_BYTES", 1 << 14)
    data = synthesize_fastq(3000, read_len=76, style="SRR", seed=6)
    blob = ngsc_export.export_ngsc(data, records_per_subblock=1000)
    foot = ngsc_import.read_footer(blob)
    assert foot.n_blocks >= 3
    assert ngsc_import.decompress_ngsc(blob) == data


def test_export_single_record_and_odd_tail():
    _roundtrip(b"@one 1\nACGT\n+\nIIII\n")
    _roundtrip(synthesize_fastq(33, read_len=36, seed=8))  # 32-block + 1


def test_export_refuses_empty():
    with pytest.raises(ngsc_export.NgscExportError):
        ngsc_export.export_ngsc(b"")


def test_export_u32_overflow_value_stays_char():
    """A digit string exceeding uint32 cannot round-trip through the
    reference's numeric coding (%d re-emission) — it must stay a char
    field and still round-trip byte-exactly."""
    recs = []
    for i in range(64):
        t = b"@big 4294967296%d tail\n" % i
        recs.append(t + b"ACGT\n+\nIIII\n")
    _roundtrip(b"".join(recs))


def test_export_chunk_cap_no_zero_length_chunks(monkeypatch):
    """When a block hits the 62-chunk cap with room left, the next payload
    goes to a fresh block instead of being 'split' into a full LSBS chunk
    plus a zero-length FSBS continuation — a shape the reference writer
    never emits (ADVICE r4). Assert every emitted chunk is non-empty and
    the container still round-trips."""
    monkeypatch.setattr(ngsc_export, "BLOCK_BYTES", 1 << 15)
    payloads = [b"x" * 300] * 80          # 80 tiny sub-blocks, all fit
    blocks, n_sub = ngsc_export._assemble_blocks(list(payloads))
    assert n_sub == 80
    total = 0
    for blk in blocks:
        _, _, sbol, _ = ngsc_import._parse_block(blk, n_ranks=1)
        assert all(n > 0 for n in sbol), "zero-length chunk emitted"
        assert len(sbol) <= 63
        total += len(sbol)
    assert total == 80

    data = synthesize_fastq(2400, read_len=36, seed=17)
    blob = ngsc_export.export_ngsc(data, records_per_subblock=30)
    assert ngsc_import.decompress_ngsc(blob) == data


@pytest.mark.parametrize("read_len", [300, 1000])
def test_export_long_reads(read_len):
    """Reference-format interop at long reads: the reference allocates one
    quality tree per position unconditionally (tasks.cpp:590-605), so the
    exporter must emit max_quality_length+1 trees and the importer must
    walk them all."""
    data = synthesize_fastq(120, read_len=read_len, seed=13,
                            ambiguity_rate=0.003)
    blob = ngsc_export.export_ngsc(data, records_per_subblock=50)
    assert ngsc_import.decompress_ngsc(blob) == data
