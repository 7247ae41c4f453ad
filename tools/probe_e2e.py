"""One-process TPU e2e comparison: scatter vs rows pack, with stage timing."""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["PHYNGSC_TIMING"] = "1"

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import logging

logging.getLogger("phyngsc_tpu").setLevel(logging.INFO)
logging.basicConfig(level=logging.INFO)

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.pipeline.compress import compress_bytes
from phyngsc_tpu.utils.fastq import synthesize_fastq

cfg = CodecConfig(subblock_input_bytes=1 << 30,
                  max_records_per_subblock=1 << 16,
                  records_per_substream=64)
data = synthesize_fastq(int(32e6 / 121), read_len=36, seed=7)
print("input MB:", len(data) / 1e6, "backend:", jax.default_backend())

for mode in ("scatter", "rows", "rows_compact", "scatter", "rows", "rows_compact"):
    os.environ["PHYNGSC_PACK"] = mode
    compress_bytes(data, cfg, 1)  # warm compile
    t0 = time.perf_counter()
    comp = compress_bytes(data, cfg, 1)
    dt = time.perf_counter() - t0
    print(f"mode={mode}: {dt:.2f}s  {len(data)/dt/1e6:.1f} MB/s  "
          f"ratio {len(data)/len(comp):.3f}")
