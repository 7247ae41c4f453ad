"""Validate the bench device-only loop: free-running vs data-chained.

If the relay elides/reorders free-running identical dispatches, the bench's
device_only_mbps is inflated. The chained variant makes iteration i+1's
input depend on iteration i's output, forcing sequential execution.
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.models import dna as dmod
from phyngsc_tpu.models import quality as qmod
from phyngsc_tpu.ops import bitpack as bpmod
from phyngsc_tpu.ops import lookup as lkmod
from phyngsc_tpu.ops import transfer as trmod
from phyngsc_tpu.pipeline import subblock as sbmod


def main():
    cfg = CodecConfig(max_records_per_subblock=1 << 16,
                      records_per_substream=64)
    R, L, G = 65536, 36, cfg.records_per_substream
    rng = np.random.default_rng(0)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    seq_np = acgt[rng.integers(0, 4, size=(R, L))]
    qual_np = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    s_mode, s_words = trmod.pack_seq_np(seq_np)
    q_mode, q_words = trmod.pack_qual_np(qual_np)
    blob_in = jnp.array(np.concatenate([s_words, q_words]))
    lens = jnp.array(np.full(R, L, np.int32))
    seq, qual_t, keep, counts_blob = sbmod._analyze_all(
        blob_in, lens, seq_mode=s_mode, qual_mode=q_mode, L=L)
    counts = np.asarray(counts_blob)
    qc = counts[: L * 256].reshape(L, 256)
    tables, q_group = qmod.build_tables_adaptive(qc, cfg)
    d_plan = dmod.plan(counts[L * 256:], cfg)
    d_group = (lkmod.group_for(int(d_plan.lens_tab.max()) or 1)
               if d_plan.mode == dmod.MODE_HUFFMAN else 2)
    S = R // G
    pack = bpmod.pack_mode()
    if pack == "rows":
        q_cap = d_cap = 0
    else:
        worst = sbmod._word_cap(R, L, G)
        q_cap = sbmod._exact_cap(qc, tables.lens, S, worst)
        d_lens_for_cap = (np.full(256, 2, np.int64)
                          if d_plan.mode == dmod.MODE_PLAIN else d_plan.lens_tab)
        d_cap = sbmod._exact_cap(counts[L * 256:], d_lens_for_cap, S, worst)
    qc_j = jnp.array(tables.codes)
    ql_j = jnp.array(tables.lens)
    dc_j = jnp.array(d_plan.codes_tab)
    dl_j = jnp.array(d_plan.lens_tab)
    print("pack mode:", pack, "q_group:", q_group, "d_group:", d_group,
          "d_mode:", d_plan.mode, flush=True)

    def step(bi):
        _, qt, kp, blob_c = sbmod._analyze_all(
            bi, lens, seq_mode=s_mode, qual_mode=q_mode, L=L)
        out = sbmod._encode_all(
            qt, kp, seq, lens, qc_j, ql_j, dc_j, dl_j,
            d_plan.mode, G, q_cap, d_cap, q_group, d_group, pack)
        return out

    n_it = 6
    # (a) bench protocol: free-running, final block
    jax.block_until_ready(step(blob_in))
    t0 = time.perf_counter()
    for _ in range(n_it):
        r = step(blob_in)
    jax.block_until_ready(r)
    free_ms = (time.perf_counter() - t0) / n_it * 1e3

    # (b) chained: next input = f(prev output) with unchanged low bits
    @jax.jit
    def perturb(bi, out):
        return bi ^ (jnp.sum(out, dtype=jnp.uint32) & jnp.uint32(0))

    # note: &0 might be folded; use a real value-preserving dependency:
    @jax.jit
    def perturb2(bi, out):
        parity = (jnp.sum(out, dtype=jnp.uint32) & jnp.uint32(1))
        return bi ^ parity ^ parity  # still folds? guard with min
    # strongest: actually change one word, then change it back next iter is
    # complex — instead xor a data-dependent 0 computed via comparison that
    # XLA cannot fold across executables: parity - parity stays inside one
    # jit... use where on a scalar:
    @jax.jit
    def perturb3(bi, out):
        p = jnp.sum(out, dtype=jnp.uint32) % jnp.uint32(2)
        w0 = bi[0] + p            # may change value by +1 (harmless: it is
        return bi.at[0].set(w0)   # packed plane data; decode not run here)

    bi = blob_in
    jax.block_until_ready(step(bi))
    jax.block_until_ready(perturb3(bi, step(bi)))  # warm perturb3's compile
    t0 = time.perf_counter()
    for _ in range(n_it):
        r = step(bi)
        bi = perturb3(bi, r)
    np.asarray(bi[:1])  # fetch forces the whole chain
    chain_ms = (time.perf_counter() - t0) / n_it * 1e3

    raw_mb = R * 121 / 1e6
    print(f"free-running: {free_ms:7.2f} ms/iter -> {raw_mb/free_ms*1e3:7.1f} MB/s")
    print(f"chained:      {chain_ms:7.2f} ms/iter -> {raw_mb/chain_ms*1e3:7.1f} MB/s")


if __name__ == "__main__":
    main()
