"""Decompression driver — the component the reference never shipped (C15:
Makefile:7 declares phyNGSD but phyNGSD.cpp is absent). Reconstructed from
the container spec: read the trailing footer, walk blocks in file order using
the per-writer last-block sizes, stitch split sub-blocks, decode each
sub-block (quality before DNA), and place each decoded chunk at its absolute
output offset — writer w's region start is recoverable from the footer
(nominal boundary + recorded overlap, the inverse of parallel/partition.py),
and chunks within a writer are sequential, so the driver streams with
bounded memory instead of accumulating the whole FASTQ."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.container import block as blockmod
from phyngsc_tpu.container import footer as footermod
from phyngsc_tpu.pipeline import subblock as sbmod


def writer_output_starts(foot: footermod.Footer) -> list:
    """Absolute FASTQ offset of each writer's first record, reconstructed
    from the footer exactly as partition_regions computed it: nominal
    boundary size*w/P plus the recorded overlap scan, clamped monotonic."""
    starts = []
    for w in range(foot.n_writers):
        a = foot.fastq_size * w // foot.n_writers + foot.overlaps[w]
        starts.append(max(a, starts[-1]) if starts else a)
    return starts


def _read_footer_any(data) -> footermod.Footer:
    if isinstance(data, np.ndarray):
        tail = footermod.footer_region_size(data.shape[0])
        return footermod.read_footer(bytes(data[-tail:]))
    return footermod.read_footer(data)


def _decode_stream(data, foot: footermod.Footer, cfg: Optional[CodecConfig],
                   write_at, writer_filter=None) -> None:
    """Core streaming decode: calls write_at(offset, chunk) for every decoded
    sub-block, software-pipelined (stage A of later sub-blocks overlaps the
    fused device→host fetch of earlier ones). Holds at most pipeline_depth
    in-flight sub-blocks — no whole-file accumulation.

    writer_filter: optional set of writer ids — only their blocks decode
    (the multi-process driver assigns each process a writer subset; a
    writer's sub-blocks never split across another writer's blocks, so the
    filtered stream stitches identically)."""
    import dataclasses

    cfg = cfg or CodecConfig()
    legacy_trees = foot.version <= 3
    if (foot.records_per_substream != cfg.records_per_substream
            or foot.max_code_len != cfg.max_code_len
            or cfg.legacy_tail_trees != legacy_trees):
        # container geometry + version compat win, everything else (shards,
        # pipeline depth, worker counts) stays the caller's choice
        cfg = dataclasses.replace(
            cfg,
            records_per_substream=foot.records_per_substream,
            max_code_len=foot.max_code_len,
            legacy_tail_trees=legacy_trees,
        )
    codec = None
    if cfg.data_shards > 1:
        from phyngsc_tpu.parallel.mesh import ShardedSubblockCodec, make_mesh

        codec = ShardedSubblockCodec(make_mesh(cfg.data_shards, 1, cfg=cfg),
                                     cfg)
    sizes = foot.block_sizes_in_file_order()
    starts = writer_output_starts(foot)
    cursor = list(starts)  # next output offset per writer

    # per-stage timing sink (same contract as the compress driver):
    # d.parse / d.device_dispatch / d.fetch / d.reassemble
    sbmod.TIMING = {} if os.environ.get("PHYNGSC_TIMING") else None

    def blocks():
        off = 0
        for size, wid in zip(sizes, foot.cbo):
            if writer_filter is None or wid in writer_filter:
                yield wid, bytes(data[off : off + size])  # one block at a time
            off += size

    from phyngsc_tpu.utils.shapes import BucketCtx

    buckets = BucketCtx()  # one decode executable set per run: pads promote
    written = 0
    pending = []  # [(wid, _DStage)]

    def _drain_one():
        nonlocal written
        w, fut = pending.pop(0)
        chunk = fut.result()
        write_at(cursor[w], chunk)
        cursor[w] += len(chunk)
        written += len(chunk)
        lim = starts[w + 1] if w + 1 < len(starts) else foot.fastq_size
        if cursor[w] > lim:
            raise ValueError(
                f"writer {w} decoded past its region ({cursor[w]} > {lim}): "
                "corrupt container")

    # host worker pool: stage B (blob fetch + host restore + FASTQ
    # reassembly — the decode host wall) and the title decode inside stage A
    # run off the dispatch thread, so neighboring sub-blocks' host work
    # overlaps each other and the device (numpy + the native runtime
    # release the GIL). Chunks still complete IN ORDER: the drain waits on
    # the oldest future, so per-writer output offsets stay sequential.
    # Bucket decisions stay on this thread for deterministic executables
    # (same discipline as the compress driver).
    import concurrent.futures as cf

    workers = cfg.host_workers or (os.cpu_count() or 2)
    with cf.ThreadPoolExecutor(max_workers=max(2, workers)) as executor:
        for wid, payload in blockmod.iter_subblocks(blocks()):
            st = sbmod.decode_stage_a(payload, cfg, buckets, executor, codec)
            pending.append((wid, executor.submit(sbmod.decode_stage_b, st)))
            if len(pending) >= max(cfg.pipeline_depth, 1):
                _drain_one()
        while pending:
            _drain_one()

    if writer_filter is None:
        expect = foot.fastq_size
    else:
        expect = sum(
            (starts[w + 1] if w + 1 < len(starts) else foot.fastq_size)
            - starts[w] for w in writer_filter)
    if written != expect:
        raise ValueError(
            f"decompressed size {written} != expected {expect} "
            f"(footer fastq_size {foot.fastq_size})")
    if sbmod.TIMING is not None:
        from phyngsc_tpu.utils.logging import info

        parts = " ".join(f"{k}={v:.2f}s"
                         for k, v in sorted(sbmod.TIMING.items()))
        info("decode timing: %s", parts)


def decompress_bytes(data, cfg: Optional[CodecConfig] = None) -> bytes:
    """`data` is bytes or any buffer (np.memmap works — blocks are sliced
    lazily, so large containers stream from the page cache).

    Chunks are collected and assembled only after _decode_stream verified
    the decoded total equals the footer's fastq_size — never allocate from
    an (unverifiable, possibly corrupt) footer claim up front."""
    foot = _read_footer_any(data)
    chunks = []

    def write_at(off: int, chunk: bytes) -> None:
        chunks.append((off, chunk))

    _decode_stream(data, foot, cfg, write_at)
    # exact tiling: chunks must cover [0, fastq_size) with no overlap —
    # corrupt footer overlaps could otherwise misplace writers silently
    pos = 0
    for off, chunk in sorted(chunks, key=lambda c: c[0]):
        if off != pos:
            raise ValueError(
                f"corrupt container: decoded chunks do not tile the output "
                f"(gap/overlap at {pos} vs {off})")
        pos += len(chunk)
    out = bytearray(foot.fastq_size)
    for off, chunk in chunks:
        out[off : off + len(chunk)] = chunk
    return bytes(out)


def decompress_file(in_path: str, out_path: str,
                    cfg: Optional[CodecConfig] = None) -> None:
    """Bounded-memory file-to-file decompression: the container is memmapped,
    decoded chunks are pwritten at their absolute offsets as they complete —
    RSS is flat in the file size."""
    data = np.memmap(in_path, dtype=np.uint8, mode="r")
    foot = _read_footer_any(data)
    fd = os.open(out_path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o644)
    try:
        _decode_stream(data, foot, cfg,
                       lambda off, chunk: os.pwrite(fd, chunk, off))
        # only after the decoded total verified against the footer claim —
        # an up-front ftruncate from a corrupt footer would create a huge
        # sparse file
        os.ftruncate(fd, foot.fastq_size)
    finally:
        os.close(fd)
