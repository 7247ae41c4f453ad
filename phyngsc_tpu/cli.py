"""Command-line driver.

Reference usage: `mpiexec -np P ./phyNGSC in.fastq out.ngsc T` (README.md:56,
arg validation phyNGSC.cpp:61-105). Here:

    python -m phyngsc_tpu compress   in.fastq out.ngsct [--writers P] [...]
    python -m phyngsc_tpu decompress in.ngsct out.fastq
    python -m phyngsc_tpu verify     in.fastq            (round-trip check)

Unlike the reference (>= 2 ranks required, quirk #6), one writer is fine.
"""

from __future__ import annotations

import argparse
import sys
import time

from phyngsc_tpu.config import CodecConfig


def _add_codec_flags(p: argparse.ArgumentParser) -> None:
    d = CodecConfig()
    p.add_argument("--block-size", type=int, default=d.block_size,
                   help="container block size in bytes (default 8 MiB)")
    p.add_argument("--subblock-bytes", type=int, default=d.subblock_input_bytes,
                   help="raw input bytes per sub-block / device batch")
    p.add_argument("--substream-records", type=int, default=d.records_per_substream,
                   help="records per decode substream")
    p.add_argument("--max-code-len", type=int, default=d.max_code_len,
                   help="Huffman code length cap (<= 12)")


def _cfg_from(args) -> CodecConfig:
    return CodecConfig(
        block_size=args.block_size,
        subblock_input_bytes=args.subblock_bytes,
        records_per_substream=args.substream_records,
        max_code_len=args.max_code_len,
        data_shards=getattr(args, "data_shards", 1),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="phyngsc_tpu",
                                 description="TPU-native FASTQ compressor")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress", help="FASTQ → .ngsct")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("--writers", type=int, default=1,
                   help="number of logical writers (file regions)")
    c.add_argument("--data-shards", type=int, default=1,
                   help="shard stream encoders over this many devices")
    c.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace to DIR")
    _add_codec_flags(c)

    d = sub.add_parser("decompress", help=".ngsct → FASTQ")
    d.add_argument("input")
    d.add_argument("output")

    v = sub.add_parser("verify", help="compress+decompress+compare in memory")
    v.add_argument("input")
    v.add_argument("--writers", type=int, default=1)
    _add_codec_flags(v)

    args = ap.parse_args(argv)

    if args.cmd == "compress":
        from phyngsc_tpu.pipeline.compress import compress_file
        from phyngsc_tpu.utils.logging import trace

        stats: list = []
        t0 = time.perf_counter()
        with trace(args.profile):
            compress_file(args.input, args.output, _cfg_from(args),
                          args.writers, stats)
        dt = time.perf_counter() - t0
        for s in stats:
            print(f"[I] writer {s.writer_id}: {s.seconds:.3f}s "
                  f"blocks={s.n_blocks} subblocks={s.n_subblocks} "
                  f"in={s.input_bytes} out={s.output_bytes}")
        total_in = sum(s.input_bytes for s in stats)
        print(f"[I] total {dt:.3f}s  {total_in / max(dt, 1e-9) / 1e6:.2f} MB/s")
        return 0

    if args.cmd == "decompress":
        from phyngsc_tpu.pipeline.decompress import decompress_file

        t0 = time.perf_counter()
        decompress_file(args.input, args.output)
        print(f"[I] decompressed in {time.perf_counter() - t0:.3f}s")
        return 0

    if args.cmd == "verify":
        from phyngsc_tpu.pipeline.compress import compress_bytes
        from phyngsc_tpu.pipeline.decompress import decompress_bytes

        with open(args.input, "rb") as f:
            data = f.read()
        comp = compress_bytes(data, _cfg_from(args), args.writers)
        back = decompress_bytes(comp)
        ok = back == data
        ratio = len(data) / max(len(comp), 1)
        print(f"[I] round-trip {'OK' if ok else 'FAILED'}  "
              f"{len(data)} → {len(comp)} bytes  ratio {ratio:.3f}x")
        return 0 if ok else 1

    return 2


if __name__ == "__main__":
    sys.exit(main())
