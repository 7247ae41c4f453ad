import numpy as np
import pytest

from phyngsc_tpu.utils.fastq import (
    FastqFormatError,
    align_region_start,
    index_records,
    records_to_text,
    synthesize_fastq,
)


def test_synthesize_shapes():
    data = synthesize_fastq(100, read_len=36, seed=1)
    lines = data.split(b"\n")
    assert lines[-1] == b""
    lines = lines[:-1]
    assert len(lines) == 400
    assert lines[0].startswith(b"@ERR005195.1 ")
    assert len(lines[1]) == 36
    assert lines[2] == b"+"
    assert len(lines[3]) == 36


def test_index_records_basic():
    data = synthesize_fastq(50, read_len=36, seed=2)
    buf = np.frombuffer(data, dtype=np.uint8)
    idx = index_records(buf)
    assert idx.n_records == 50
    assert int(idx.title_start[0]) == 0
    assert np.all(idx.seq_len == 36)
    assert idx.end_offset == len(data)
    # spans reproduce the text
    t0 = bytes(buf[idx.title_start[0] : idx.title_end[0]])
    assert t0.startswith(b"@ERR005195.1")


def test_index_roundtrip_text():
    data = synthesize_fastq(20, read_len=17, seed=3, variable_length=True)
    buf = np.frombuffer(data, dtype=np.uint8)
    idx = index_records(buf)
    titles = [bytes(buf[a:b]) for a, b in zip(idx.title_start, idx.title_end)]
    seqs = [bytes(buf[a:b]) for a, b in zip(idx.seq_start, idx.seq_end)]
    quals = [bytes(buf[a:b]) for a, b in zip(idx.qual_start, idx.qual_end)]
    assert records_to_text(titles, seqs, quals) == data


def test_index_ignores_trailing_partial():
    data = synthesize_fastq(10, seed=4)
    buf = np.frombuffer(data + b"@partial-record\nACGT", dtype=np.uint8)
    idx = index_records(buf)
    assert idx.n_records == 10
    assert idx.end_offset == len(data)


def test_validation_rejects_bad_plus():
    data = synthesize_fastq(3, seed=5).replace(b"\n+\n", b"\n+x\n", 1)
    with pytest.raises(FastqFormatError):
        index_records(np.frombuffer(data, dtype=np.uint8))


def test_validation_rejects_qual_len_mismatch():
    data = b"@r1\nACGT\n+\nIII\n"
    with pytest.raises(FastqFormatError):
        index_records(np.frombuffer(data, dtype=np.uint8))


def test_align_region_start():
    data = synthesize_fastq(100, seed=6)
    buf = np.frombuffer(data, dtype=np.uint8)
    idx = index_records(buf)
    # from any interior byte, alignment lands on the next record start
    for probe in [1, 57, 200, 1111]:
        got = align_region_start(buf, probe, overlap=4096)
        starts = set(int(s) for s in idx.title_start)
        assert got in starts
        assert got >= probe - 1
    assert align_region_start(buf, 0, overlap=10) == 0
    # no record start within a tiny window → -1
    assert align_region_start(buf, int(idx.title_start[1]) + 2, overlap=1) == -1


def test_srr_style():
    data = synthesize_fastq(5, read_len=76, style="SRR", seed=7)
    buf = np.frombuffer(data, dtype=np.uint8)
    idx = index_records(buf)
    assert idx.n_records == 5
    assert np.all(idx.seq_len == 76)
    assert b"length=76" in data
