"""On-chip attribution of the encode chain (slope-timed)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.models import dna, quality
from phyngsc_tpu.ops import bitpack, histogram, lookup, transfer
from phyngsc_tpu.pipeline import subblock as sbmod


def slope_ms(fn, sync, n=8):
    sync(fn())
    def timed(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn()
        sync(r)
        return time.perf_counter() - t0
    timed(1)
    return (timed(1 + n) - timed(1)) / n * 1e3


def main():
    cfg = CodecConfig()
    R, L, G = 65536, 36, 64
    rng = np.random.default_rng(0)
    seq_np = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, size=(R, L))]
    qual_np = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    s_mode, s_words = transfer.pack_seq_np(seq_np)
    q_mode, q_words = transfer.pack_qual_np(qual_np)
    blob = jax.device_put(np.concatenate([s_words, q_words]))
    lens = jax.device_put(np.full(R, L, np.int32))
    seq = jax.device_put(seq_np)
    qual = jax.device_put(qual_np)
    valid = jax.device_put(np.ones((R, L), bool))
    sync = lambda r: np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:4])

    ns = transfer.n_words(R * L, "seq", s_mode)
    t = slope_ms(lambda: transfer.unpack_seq(blob[:ns], s_mode, R, L), sync)
    print(f"unpack seq plane:        {t:7.2f} ms", flush=True)
    t = slope_ms(lambda: dna.transfer_ambiguity(seq, qual, lens)[0], sync)
    print(f"transfer_ambiguity:      {t:7.2f} ms", flush=True)
    t = slope_ms(lambda: quality.analyze(qual, lens), sync)
    print(f"quality.analyze (hist):  {t:7.2f} ms", flush=True)
    t = slope_ms(lambda: histogram.position_histogram_pallas(qual, valid),
                 sync)
    print(f"pallas histogram alone:  {t:7.2f} ms", flush=True)
    t = slope_ms(lambda: dna.analyze(seq, valid), sync)
    print(f"dna.analyze:             {t:7.2f} ms", flush=True)
    t = slope_ms(lambda: sbmod._analyze_all(blob, lens, seq_mode=s_mode,
                                            qual_mode=q_mode, L=L)[3], sync)
    print(f"analyze_all fused:       {t:7.2f} ms", flush=True)

    # encode side
    counts = np.asarray(quality.analyze(qual, lens))
    tables, q_group = quality.build_tables_adaptive(counts, cfg)
    qc = jax.device_put(tables.codes)
    ql = jax.device_put(tables.lens)
    fused_tab = lookup.fuse_tables(jnp.asarray(tables.codes),
                                   jnp.asarray(tables.lens))
    ft = jax.device_put(np.asarray(fused_tab))
    t = slope_ms(lambda: lookup.fused_lookup(qual, ft), sync)
    print(f"quality lookup:          {t:7.2f} ms (group {q_group})", flush=True)

    cap = sbmod._word_cap(R, L, G)
    t = slope_ms(lambda: quality.encode_device(qual, lens, qc, ql, G, cap,
                                               q_group, "rows")[0], sync)
    print(f"quality encode rows:     {t:7.2f} ms", flush=True)
    t = slope_ms(lambda: quality.encode_device(qual, lens, qc, ql, G, cap,
                                               q_group, "rows_compact")[0],
                 sync)
    print(f"quality encode compact:  {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
