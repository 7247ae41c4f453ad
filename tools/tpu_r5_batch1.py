"""Round-5 TPU batch #1: validate new kernel shapes on real Mosaic.

(a) 128-lane DNA histogram: correctness vs 256-lane + analyze-graph timing
(b) 1000 bp period-tiled walk decode: compile + roundtrip + slope timing
(c) 100 bp decode rate (VERDICT r4 next #2 'Done' bar: >= 500 MB/s)
(d) e2e roundtrip at 76/100/1000 bp on the real chip

One process, one relay claim; everything batched (CLAUDE.md TPU discipline).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

t0 = time.perf_counter()
np.asarray(jax.device_put(np.zeros(8, np.uint32)))
print(f"[claim] {time.perf_counter()-t0:.1f}s backend={jax.default_backend()}",
      flush=True)

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.models import dna as dmod
from phyngsc_tpu.ops import histogram, transfer as trmod
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


# ---- (a) 128-lane DNA histogram ------------------------------------------
rng = np.random.default_rng(0)
acgt = np.frombuffer(b"ACGT", np.uint8)
R, L = 65536, 36
seq_np = acgt[rng.integers(0, 4, size=(R, L))]
keep_np = np.ones((R, L), bool)
seq_j = jnp.array(seq_np)
keep_j = jnp.array(keep_np)
h256 = np.asarray(dmod.analyze(seq_j, keep_j, small_alpha=False))
h128 = np.asarray(dmod.analyze(seq_j, keep_j, small_alpha=True))
assert np.array_equal(h256, h128), "128-lane histogram mismatch!"
t256 = slope(lambda: dmod.analyze(seq_j, keep_j, small_alpha=False))
t128 = slope(lambda: dmod.analyze(seq_j, keep_j, small_alpha=True))
print(f"[hist] dna analyze 256-lane {t256*1e3:.3f} ms  "
      f"128-lane {t128*1e3:.3f} ms  ({t256/t128:.2f}x)", flush=True)

# full analyze graph with/without d_small
qual_np = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
s_mode, s_words = trmod.pack_seq_np(seq_np)
q_mode, q_words = trmod.pack_qual_np(qual_np)
blob_in = jnp.array(np.concatenate([s_words, q_words]))
lens_j = jnp.array(np.full(R, L, np.int32))
for dsm in (False, True):
    ta = slope(lambda dsm=dsm: sbmod._analyze_all(
        blob_in, lens_j, seq_mode=s_mode, qual_mode=q_mode, L=L,
        d_small=dsm)[3])
    print(f"[hist] _analyze_all d_small={dsm}: {ta*1e3:.3f} ms", flush=True)

# ---- (b)+(c)+(d) per-length decode ---------------------------------------
cfg0 = CodecConfig(subblock_input_bytes=1 << 30, records_per_substream=64)
import dataclasses
for (Rr, Ll) in ((32768, 76), (24576, 100), (2048, 1000)):
    cfg = dataclasses.replace(cfg0, max_records_per_subblock=Rr)
    data = synthesize_fastq(Rr, read_len=Ll, seed=11)
    t = time.perf_counter()
    comp = compress_bytes(data, cfg, 1)
    tc = time.perf_counter() - t
    back = decompress_bytes(comp, cfg)
    ok = back == data
    from phyngsc_tpu.container import block as blockmod
    from phyngsc_tpu.container import footer as footermod
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
    print(f"[{Ll}bp] R={Rr} roundtrip={ok} walk={p.use_walk} "
          f"decode {per*1e3:.2f} ms = {mbps:.0f} MB/s "
          f"(compress e2e {len(data)/tc/1e6:.1f} MB/s)", flush=True)

print("[done]", flush=True)
