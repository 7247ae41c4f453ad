"""Compression driver (C1 equivalent of phyNGSC.cpp main()).

Single-host entry: partition the input into writer regions (C2), index
records (C3), encode sub-blocks on device, frame into fixed-size blocks
(C11), and write blocks at deterministic offsets with a footer TOC (C12).
Multi-host operation shares this code path: each host runs its writers and
the offset protocol exchanges per-writer block counts (parallel/offsets.py)
instead of the local prefix sum done here.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import numpy as np

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.container import block as blockmod
from phyngsc_tpu.container import footer as footermod
from phyngsc_tpu.parallel.partition import partition_regions, split_subblocks
from phyngsc_tpu.pipeline import subblock as sbmod
from phyngsc_tpu.utils.fastq import index_records


@dataclasses.dataclass
class CompressStats:
    """Per-writer report, the analogue of the reference's exit table
    (COMP_TIME / N_BLOCK / N_SUBBLOCKS, phyNGSC.cpp:1062-1066)."""
    writer_id: int
    seconds: float
    n_blocks: int
    n_subblocks: int
    input_bytes: int
    output_bytes: int


def compress_bytes(data: bytes, cfg: Optional[CodecConfig] = None,
                   n_writers: int = 1, stats_out: Optional[list] = None) -> bytes:
    return compress_array(np.frombuffer(data, dtype=np.uint8), cfg, n_writers,
                          stats_out)


def compress_array(buf: np.ndarray, cfg: Optional[CodecConfig] = None,
                   n_writers: int = 1, stats_out: Optional[list] = None) -> bytes:
    """Accepts any uint8 array — including an np.memmap, so multi-GB inputs
    stream from the page cache instead of loading resident (the reference
    reads 8 MiB windows, phyNGSC.cpp:249; the memmap gives the same
    incremental behavior with kernel readahead)."""
    cfg = cfg or CodecConfig()
    regions = partition_regions(buf, n_writers, cfg)

    codec = None
    if cfg.data_shards > 1:
        from phyngsc_tpu.parallel.mesh import ShardedSubblockCodec, make_mesh

        codec = ShardedSubblockCodec(make_mesh(cfg.data_shards, 1, cfg=cfg), cfg)

    # enumerate every (writer, sub-block record range) task up front, then run
    # the three encode stages software-pipelined across tasks: stage A of
    # task i+2 and stage B of task i+1 overlap the async device work and
    # device→host fetches of task i (the TPU analogue of the reference's
    # read/compress/write overlap across OpenMP regions).
    tasks = []  # (writer_pos, RecordIndex slice)
    t_start = time.perf_counter()
    for w, reg in enumerate(regions):
        if reg.end <= reg.start:
            continue
        idx = index_records(buf[reg.start : reg.end])
        for name in ("title_start", "title_end", "seq_start", "seq_end",
                     "qual_start", "qual_end"):
            setattr(idx, name, getattr(idx, name) + reg.start)
        rec_sizes = (idx.qual_end + 1 - idx.title_start).astype(np.int64)
        for sl in split_subblocks(rec_sizes, cfg):
            tasks.append((w, idx.slice(sl.start, sl.stop)))

    sub_payloads: List[List[bytes]] = [[] for _ in regions]
    writer_seconds = [0.0] * len(regions)
    a_q: List = []  # [(writer_pos, _StageA)]
    b_q: List = []  # [(writer_pos, _StageB)]

    import concurrent.futures as cf
    import os as _os
    import time as _time

    timing = {} if _os.environ.get("PHYNGSC_TIMING") else None
    sbmod.TIMING = timing

    def _timed(label, w, fn):
        t0 = _time.perf_counter()
        r = fn()
        dt = _time.perf_counter() - t0
        writer_seconds[w] += dt
        if timing is not None:
            timing[label] = timing.get(label, 0.0) + dt
        return r

    with cf.ThreadPoolExecutor(max_workers=2) as executor:

        def _advance_b():
            w, a = a_q.pop(0)
            b_q.append((w, _timed("stage_b", w, lambda: sbmod.stage_b(a, cfg, codec))))

        def _advance_c():
            w, b = b_q.pop(0)
            sub_payloads[w].append(_timed("stage_c", w, lambda: sbmod.stage_c(b, cfg)))

        depth = max(cfg.pipeline_depth, 1)
        for w, idx_slice in tasks:
            a_q.append((w, _timed("stage_a", w, lambda: sbmod.stage_a(
                buf, idx_slice, cfg, codec, executor))))
            if len(a_q) >= depth:
                _advance_b()
            if len(b_q) >= depth:
                _advance_c()
        while a_q:
            _advance_b()
        while b_q:
            _advance_c()
    total_s = time.perf_counter() - t_start
    if timing is not None:
        from phyngsc_tpu.utils.logging import info

        parts = " ".join(f"{k}={v:.2f}s" for k, v in sorted(timing.items()))
        info("pipeline timing: %s total=%.2fs tasks=%d", parts, total_s, len(tasks))

    per_writer_blocks: List[List[blockmod.Block]] = []
    n_subblocks_total = 0
    for w, reg in enumerate(regions):
        blocks = blockmod.pack_blocks(reg.writer_id, sub_payloads[w], cfg.block_size)
        per_writer_blocks.append(blocks)
        n_subblocks_total += len(sub_payloads[w])
        if stats_out is not None:
            in_bytes = reg.end - reg.start
            stats_out.append(CompressStats(
                writer_id=reg.writer_id,
                seconds=writer_seconds[w],
                n_blocks=len(blocks),
                n_subblocks=len(sub_payloads[w]),
                input_bytes=in_bytes,
                output_bytes=sum(len(b.payload) for b in blocks),
            ))

    # deterministic placement: writer-major order (the offset prefix-sum over
    # a single host degenerates to concatenation; multi-host uses
    # parallel/offsets.py to agree on the same order globally)
    cbo: List[int] = []
    out = bytearray()
    for blocks in per_writer_blocks:
        for b in blocks:
            cbo.append(b.writer_id)
            out += b.payload
    foot = footermod.Footer(
        fastq_size=int(buf.shape[0]),
        block_size=cfg.block_size,
        n_writers=n_writers,
        overlaps=[r.overlap_used for r in regions],
        writer_block_counts=[len(b) for b in per_writer_blocks],
        last_block_sizes=[len(b[-1].payload) if b else 0 for b in per_writer_blocks],
        cbo=cbo,
        records_per_substream=cfg.records_per_substream,
        max_code_len=cfg.max_code_len,
    )
    out += footermod.write_footer(foot)
    return bytes(out)


def compress_file(in_path: str, out_path: str, cfg: Optional[CodecConfig] = None,
                  n_writers: int = 1, stats_out: Optional[list] = None) -> None:
    buf = np.memmap(in_path, dtype=np.uint8, mode="r")
    out = compress_array(buf, cfg, n_writers, stats_out)
    with open(out_path, "wb") as f:
        f.write(out)
