"""On-chip A/B: XLA bf16x2 one-hot lookup vs the pallas VMEM kernel, plus an
honest (slope-timed) decode-graph budget.

Slope timing: time (1+n) iterations and 1 iteration, each synced by a tiny
true host fetch (block_until_ready does not block through the dev relay),
and divide the difference by n — constant dispatch/fetch latency cancels.
"""
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

from phyngsc_tpu.ops import lookup


def slope_ms(fn, sync, n=8):
    sync(fn())  # warm (compile + first execution)
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
    R, A = 65536, 256
    rng = np.random.default_rng(0)
    for L in (36, 80):
        tab = ((rng.integers(0, 13, size=(L, A)) << lookup.CODE_BITS)
               | rng.integers(0, 1 << 12, size=(L, A))).astype(np.int32)
        sym = rng.integers(0, A, size=(R, L)).astype(np.uint8)
        symj = jax.device_put(sym)
        tabj = jax.device_put(tab)
        sync = lambda r: np.asarray(r[:1, :1])

        a = np.asarray(lookup.fused_lookup(symj, tabj))
        b = np.asarray(lookup.fused_lookup_pallas(symj, tabj))
        ok = bool((a == b).all())
        t_xla = slope_ms(lambda: lookup.fused_lookup(symj, tabj), sync)
        t_pal = slope_ms(lambda: lookup.fused_lookup_pallas(symj, tabj), sync)
        print(f"L={L:3d} bitexact={ok} xla({lookup.VARIANT})={t_xla:7.2f} ms"
              f"  pallas={t_pal:7.2f} ms  speedup={t_xla / t_pal:5.2f}x",
              flush=True)

    # honest decode budget on a real sub-block
    from phyngsc_tpu.config import CodecConfig
    from phyngsc_tpu.container import block as blockmod
    from phyngsc_tpu.container import footer as footermod
    from phyngsc_tpu.pipeline import subblock as sbmod
    from phyngsc_tpu.pipeline.compress import compress_bytes
    from phyngsc_tpu.utils.fastq import synthesize_fastq

    cfg = CodecConfig(subblock_input_bytes=1 << 30,
                      max_records_per_subblock=1 << 16)
    data = synthesize_fastq(80000, read_len=36, seed=7)
    comp = compress_bytes(data, cfg)
    foot = footermod.read_footer(comp)
    sizes = foot.block_sizes_in_file_order()

    def blocks():
        off = 0
        for size, wid in zip(sizes, foot.cbo):
            yield wid, bytes(comp[off : off + size])
            off += size

    payload = next(iter(blockmod.iter_subblocks(blocks())))[1]
    p = sbmod._decode_parse(payload, cfg)
    dev = sbmod._decode_device_inputs(p, cfg)
    sync1 = lambda r: np.asarray(r.reshape(-1)[:8])

    t_full = slope_ms(lambda: sbmod._decode_device(p, dev, cfg), sync1)
    rec_bytes = len(data) / 80000
    print(f"decode fused: {t_full:7.2f} ms/sub-block (R={p.R})"
          f"  => {p.R * rec_bytes / t_full / 1e3:6.1f} MB/s", flush=True)

    # attribution: quality walk alone (walk path works from the fused blob —
    # rebuild its device inputs here from the parse result, int32 LUTs as the
    # kernels consume)
    from phyngsc_tpu.models import quality as qmod
    from phyngsc_tpu.ops import bitpack as bpmod
    if p.use_walk:
        from phyngsc_tpu.models import dna as dmod
        q_luts = jax.device_put(
            p.q_tables.luts(cfg.max_code_len).astype(np.int32))
        q_dense = bpmod.dense_words_device(
            jax.device_put(p.q_words), jax.device_put(p.q_sub),
            p.q_wmax, p.sp)
        lens = jax.device_put(p.lens_pad)
        t_dense = slope_ms(
            lambda: bpmod.dense_words_device(
                jax.device_put(p.q_words), jax.device_put(p.q_sub),
                p.q_wmax, p.sp), sync1)
        print(f"device densify alone: {t_dense:7.2f} ms "
              f"(plane {p.q_wmax}x{p.sp})", flush=True)
        if p.variable:
            t_q = slope_ms(
                lambda: qmod.decode_device_walk_masked(
                    q_dense, lens, q_luts, p.L, p.G, cfg.max_code_len),
                sync1)
            print(f"quality masked walk alone: {t_q:7.2f} ms", flush=True)
        else:
            t_q = slope_ms(
                lambda: qmod.decode_device_walk(
                    q_dense, lens, q_luts, p.L, p.Lt, p.G, cfg.max_code_len),
                sync1)
            print(f"quality pallas walk alone: {t_q:7.2f} ms", flush=True)
        d_dense = bpmod.dense_words_device(
            jax.device_put(p.d_words), jax.device_put(p.d_sub),
            p.d_wmax, p.sp)
        keep = jnp.ones((p.Rp, p.L), bool)
        if p.d_plan.mode == dmod.MODE_PLAIN:
            t_d = slope_ms(
                lambda: dmod.decode_plain_walk(d_dense, keep, p.L, p.G),
                sync1)
            print(f"dna plain2 walk alone: {t_d:7.2f} ms", flush=True)
        else:
            d_luts = jax.device_put(
                p.d_plan.luts(cfg.max_code_len).astype(np.int32))
            t_d = slope_ms(
                lambda: dmod.decode_huffman_walk(
                    d_dense, keep, d_luts, p.L, p.G, cfg.max_code_len),
                sync1)
            print(f"dna pallas walk alone: {t_d:7.2f} ms", flush=True)
    elif p.pplan is not None:
        luts2, _, _, pair_bits = p.pplan
        t_q = slope_ms(
            lambda: qmod.decode_device_pairs(
                dev["q_words"], dev["q_sub"], dev["lens"], luts2,
                dev["pair_vec"], dev["half_vec"], p.L, p.Lt, p.G, pair_bits),
            sync1)
        print(f"quality pair walk alone: {t_q:7.2f} ms (pair bits "
              f"{pair_bits})", flush=True)
    else:
        q_luts32 = dev["q_luts"].astype(jnp.int32)  # uploads are int16
        t_q = slope_ms(
            lambda: qmod.decode_device(
                dev["q_words"], dev["q_sub"], dev["lens"], q_luts32,
                p.L, p.G, cfg.max_code_len, uniform_len=p.Lt),
            sync1)
        print(f"quality single walk alone: {t_q:7.2f} ms (pair path OFF)",
              flush=True)

    # encode reference at the same shape
    from phyngsc_tpu.ops import transfer as trmod
    seq_np = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, size=(p.Rp, p.L))]
    qual_np = rng.integers(33, 74, size=(p.Rp, p.L)).astype(np.uint8)
    s_mode, s_words = trmod.pack_seq_np(seq_np)
    q_mode, q_words = trmod.pack_qual_np(qual_np)
    blob_in = jnp.array(np.concatenate([s_words, q_words]))
    lens = jnp.array(np.full(p.Rp, p.L, np.int32))
    t_an = slope_ms(
        lambda: sbmod._analyze_all(blob_in, lens, seq_mode=s_mode,
                                   qual_mode=q_mode, L=p.L)[3],
        sync1)
    print(f"analyze_all alone: {t_an:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
