"""Bounded-memory streaming drivers: file-to-file round trips, byte identity
with the in-memory path, and flat host allocation as input grows (the
reference writes each 8 MiB block inside its region loop, phyNGSC.cpp:875 —
these tests pin the same O(buffers) behavior for compress AND the decompress
driver the reference never shipped)."""

import os
import tracemalloc

import numpy as np
import pytest

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.pipeline.compress import compress_bytes, compress_file
from phyngsc_tpu.pipeline.decompress import (decompress_bytes,
                                             decompress_file,
                                             writer_output_starts)
from phyngsc_tpu.utils.fastq import synthesize_fastq

CFG = CodecConfig(
    subblock_input_bytes=96 * 1024,
    max_records_per_subblock=1024,
    block_size=1 << 16,       # minimum allowed: forces multi-block containers
    index_window_bytes=1 << 16,  # tiny windows: exercise windowed indexing
)


def _make_input(tmp_path, n_records: int, seed: int = 3):
    data = synthesize_fastq(n_records, read_len=36, style="ERR005195",
                            seed=seed)
    p = tmp_path / "in.fastq"
    p.write_bytes(data)
    return str(p), data


def test_file_roundtrip_multiblock(tmp_path):
    in_path, data = _make_input(tmp_path, 16000)
    out_path = str(tmp_path / "out.ngsct")
    back_path = str(tmp_path / "back.fastq")
    stats = []
    compress_file(in_path, out_path, CFG, n_writers=3, stats_out=stats)
    assert sum(s.n_blocks for s in stats) > 3  # multiple blocks per writer
    decompress_file(out_path, back_path, CFG)
    assert open(back_path, "rb").read() == data


def test_streaming_matches_in_memory(tmp_path):
    """compress_file (streaming) and compress_bytes (BytesIO wrapper) must
    produce byte-identical containers — same framing, CBO, footer."""
    in_path, data = _make_input(tmp_path, 1500)
    out_path = str(tmp_path / "out.ngsct")
    compress_file(in_path, out_path, CFG, n_writers=2)
    assert open(out_path, "rb").read() == compress_bytes(data, CFG, 2)


def test_writer_output_starts_roundtrip(tmp_path):
    """Decode-side region reconstruction must equal the encoder's
    partition: nominal + overlap, clamped monotonic."""
    from phyngsc_tpu.container import footer as footermod
    from phyngsc_tpu.parallel.partition import partition_regions

    _, data = _make_input(tmp_path, 800)
    buf = np.frombuffer(data, np.uint8)
    regions = partition_regions(buf, 4, CFG)
    comp = compress_bytes(data, CFG, 4)
    foot = footermod.read_footer(comp)
    assert writer_output_starts(foot) == [r.start for r in regions]


def test_flat_memory_compress_decompress(tmp_path):
    """Python-level allocations (bytes/bytearray held by the drivers) must
    not scale with input size: peak traced allocation for a 4x bigger input
    stays within 2x (pipeline buffers are size-bound, not count-bound).
    The old drivers held the entire output (compress) and the entire FASTQ
    (decompress), scaling ~4x here."""

    def peak_bytes(n_records, seed):
        in_path, data = _make_input(tmp_path, n_records, seed)
        out_path = str(tmp_path / f"o{n_records}.ngsct")
        back_path = str(tmp_path / f"b{n_records}.fastq")
        # warm up compile caches so jit tracing noise isn't measured
        compress_file(in_path, out_path, CFG, n_writers=1)
        tracemalloc.start()
        compress_file(in_path, out_path, CFG, n_writers=1)
        _, peak_c = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        tracemalloc.start()
        decompress_file(out_path, back_path, CFG)
        _, peak_d = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert open(back_path, "rb").read() == data
        return peak_c, peak_d

    small_c, small_d = peak_bytes(2000, seed=1)
    big_c, big_d = peak_bytes(8000, seed=1)
    assert big_c < 2 * small_c + (1 << 20), (small_c, big_c)
    assert big_d < 2 * small_d + (1 << 20), (small_d, big_d)


def test_empty_and_tiny_inputs(tmp_path):
    for n in (0, 1, 5):
        data = synthesize_fastq(n, read_len=36, style="ERR005195", seed=2)
        in_path = tmp_path / f"tiny{n}.fastq"
        in_path.write_bytes(data)
        out_path = str(tmp_path / f"tiny{n}.ngsct")
        back_path = str(tmp_path / f"tiny{n}.back")
        compress_file(str(in_path), out_path, CFG, n_writers=2)
        decompress_file(out_path, back_path, CFG)
        assert open(back_path, "rb").read() == data
