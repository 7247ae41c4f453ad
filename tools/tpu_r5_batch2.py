"""Round-5 TPU batch #2: dead-lane fetch-band fix + long-read kernels.

(a) decode rows at 36/76/100/1000 bp (100 bp was 173 MB/s from dead lanes
    pinning the fetch band; 1000 bp OOMed in the analyze kernel)
(b) a deliberately partial sub-block (R < Rp) at 36 bp — the tail-sub-block
    case every real file has
"""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

t0 = time.perf_counter()
np.asarray(jax.device_put(np.zeros(8, np.uint32)))
print(f"[claim] {time.perf_counter()-t0:.1f}s backend={jax.default_backend()}",
      flush=True)

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.container import block as blockmod
from phyngsc_tpu.container import footer as footermod
from phyngsc_tpu.pipeline import subblock as sbmod
from phyngsc_tpu.pipeline.compress import compress_bytes
from phyngsc_tpu.pipeline.decompress import decompress_bytes
from phyngsc_tpu.utils.fastq import synthesize_fastq


def slope(fn, n_it=8):
    def timed(n):
        t = time.perf_counter()
        for _ in range(n):
            r = fn()
        np.asarray(r.reshape(-1)[:8])
        return time.perf_counter() - t
    timed(1)
    return (timed(1 + n_it) - timed(1)) / n_it


cfg0 = CodecConfig(subblock_input_bytes=1 << 30, records_per_substream=64)
for (Rr, Ll) in ((65536, 36), (61000, 36), (32768, 76), (24576, 100),
                 (2048, 1000)):
    try:
        cfg = dataclasses.replace(cfg0, max_records_per_subblock=Rr)
        data = synthesize_fastq(Rr, read_len=Ll, seed=11)
        comp = compress_bytes(data, cfg, 1)
        ok = decompress_bytes(comp, cfg) == data
        foot = footermod.read_footer(comp)
        sizes = foot.block_sizes_in_file_order()

        def blocks(comp=comp, sizes=sizes, foot=foot):
            off = 0
            for size, wid in zip(sizes, foot.cbo):
                yield wid, bytes(comp[off : off + size])
                off += size

        payload = next(iter(blockmod.iter_subblocks(blocks())))[1]
        p = sbmod._decode_parse(payload, cfg)
        dev_in = sbmod._decode_device_inputs(p, cfg)
        per = slope(lambda: sbmod._decode_device(p, dev_in, cfg))
        mbps = len(data) / per / 1e6
        print(f"[{Ll}bp R={Rr}] roundtrip={ok} walk={p.use_walk} Rp={p.Rp} "
              f"decode {per*1e3:.2f} ms = {mbps:.0f} MB/s", flush=True)
    except Exception as e:
        print(f"[{Ll}bp R={Rr}] FAILED: {e!r}"[:400], flush=True)

print("[done]", flush=True)
