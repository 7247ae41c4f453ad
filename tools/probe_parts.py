"""On-chip breakdown: analyze parts, encode parts, decode variants.

Decode hypothesis: the substream LUT walk runs G*L sequential steps over S
lanes; smaller G (more substreams, fewer steps) should cut wall time if the
loop is serialization-bound rather than gather-bound. lut_bits smaller than
12 shrinks the table (VMEM residency).
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
from phyngsc_tpu.ops import bitpack, histogram, lookup
from phyngsc_tpu.pipeline import subblock as sbmod


def bench(label, fn, *args, n=10, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:42s} {ms:8.2f} ms")
    return r


def main():
    cfg = CodecConfig()
    R, L, G = 65536, 36, 64
    rng = np.random.default_rng(0)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    seq_np = acgt[rng.integers(0, 4, size=(R, L))]
    qual_np = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    stacked = jnp.array(np.stack([seq_np, qual_np]))
    lens = jnp.array(np.full(R, L, np.int32))
    print("backend:", jax.devices()[0])

    # --- analyze breakdown ---
    seq_j = jnp.array(seq_np)
    qual_j = jnp.array(qual_np)
    bench("analyze: _analyze_all (fused)", sbmod._analyze_all, stacked, lens)
    bench("analyze: transfer_ambiguity",
          jax.jit(lambda s, q, l: dmod.transfer_ambiguity(s, q, l)[0]),
          seq_j, qual_j, lens)
    v = qmod.valid_mask(lens, L)
    bench("analyze: position_histogram(q)",
          jax.jit(lambda q, vv: histogram.position_histogram(q, vv, 256)),
          qual_j, v)
    bench("analyze: dna.analyze", jax.jit(dmod.analyze), seq_j, v)

    # --- encode parts (quality stream) ---
    qual_t, keep, _ = dmod.transfer_ambiguity(seq_j, qual_j, lens)
    counts = np.asarray(qmod.analyze(qual_t, lens))
    tables, q_group = qmod.build_tables_adaptive(counts, cfg)
    print("q_group:", q_group, "max code len:", int(tables.lens.max()))
    fused_tab = jnp.array(
        np.asarray(lookup.fuse_tables(jnp.array(tables.codes),
                                      jnp.array(tables.lens))))
    bench("encode: fused_lookup", lookup.fused_lookup, qual_t, fused_tab[:L])
    fused = lookup.fused_lookup(qual_t, fused_tab[:L])
    c, le = lookup.split_fused(fused)
    le = jnp.where(v, le, 0)
    c = jnp.where(v, c, 0)
    bench("encode: group_codes", lookup.group_codes, c, le, q_group)
    pc, pl = lookup.group_codes(c, le, q_group)
    plane, sub, tot = bench("encode: pack_bits_rows", bitpack.pack_bits_rows,
                            pc, pl, G)
    S = R // G
    cap = sbmod._exact_cap(counts, tables.lens, S, sbmod._word_cap(R, L, G))
    bench("encode: compact_rows", bitpack.compact_rows, plane, sub, cap)
    for pk in ("rows", "rows_compact"):
        bench(f"encode: full quality encode [{pk}]", qmod.encode_device,
              qual_t, lens, jnp.array(tables.codes), jnp.array(tables.lens),
              G, cap, q_group, pk)

    # --- decode variants ---
    lut12 = jnp.array(tables.luts(12))
    lut8 = jnp.array(tables.luts(8)) if int(tables.lens.max()) <= 8 else None
    for Gd in (64, 16, 8):
        words, subw, total = qmod.encode_device(
            qual_t, lens, jnp.array(tables.codes), jnp.array(tables.lens),
            Gd, cap, q_group, "rows_compact")
        wj = jnp.asarray(words)
        sj = jnp.asarray(subw)
        bench(f"decode: quality G={Gd} lut12", qmod.decode_device,
              wj, sj, lens, lut12, L, Gd, 12, L)
        if lut8 is not None:
            bench(f"decode: quality G={Gd} lut8", qmod.decode_device,
                  wj, sj, lens, lut8, L, Gd, 8, L)
        # verify correctness at this G
        out = qmod.decode_device(wj, sj, lens, lut12, L, Gd, 12, L)
        ok = np.array_equal(np.asarray(out), np.asarray(qual_t))
        print(f"  decode G={Gd} correct: {ok}")


if __name__ == "__main__":
    main()
