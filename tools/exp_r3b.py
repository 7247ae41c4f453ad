"""Round-3b TPU experiment batch (ONE process, one relay claim):

  1. windowed one-hot lookup A/B (A=64 vs 256; pallas + bf16x2)
  2. quality encode graph with/without the alphabet window
  3. compact_rows cost on the record
  4. dense_words: sorts vs DMA-copy pallas kernel (+ exactness on real TPU)
  5. e2e roundtrip through the real pipeline + fused decode slope

Run with the machine otherwise idle; exits naturally (never SIGKILL).
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

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.models import quality
from phyngsc_tpu.ops import bitpack, lookup
from phyngsc_tpu.pipeline import subblock as sbmod

sync = lambda r: np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:4])


def slope_ms(fn, n=8):
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
    print("backend:", jax.default_backend(), flush=True)
    interp = jax.default_backend() != "tpu"   # CPU smoke mode
    t_start = time.perf_counter()
    cfg = CodecConfig()
    R, L, G = 65536, 36, 64
    rng = np.random.default_rng(0)
    qual_np = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    lens = jax.device_put(np.full(R, L, np.int32))
    qual = jax.device_put(qual_np)

    counts = np.asarray(quality.analyze(qual, lens))
    tables, q_group = quality.build_tables_adaptive(counts, cfg)
    off, A = lookup.window_np(counts)
    print(f"window: off={off} A={A}", flush=True)
    ft256 = np.asarray(lookup.fuse_tables(jnp.asarray(tables.codes),
                                          jnp.asarray(tables.lens)))
    ft64 = np.ascontiguousarray(ft256[:, off:off + A])
    tree = np.asarray(quality.tree_of_position(
        np.arange(L, dtype=np.int32), tables.lens.shape[0]))
    tab256 = jax.device_put(ft256[tree])
    tabA = jax.device_put(ft64[tree])
    qclip = jax.device_put(
        np.clip(qual_np.astype(np.int32) - off, 0, A - 1))

    # -- 1. lookup variants ------------------------------------------------
    t = slope_ms(lambda: lookup.fused_lookup_pallas(qual, tab256, interp))
    print(f"lookup pallas A=256:     {t:7.2f} ms", flush=True)
    t = slope_ms(lambda: lookup.fused_lookup_pallas(qclip, tabA, interp))
    print(f"lookup pallas A={A}:      {t:7.2f} ms", flush=True)
    lookup.VARIANT = "bf16x2"
    t = slope_ms(lambda: lookup.fused_lookup(qual, tab256))
    print(f"lookup bf16x2 A=256:     {t:7.2f} ms", flush=True)
    t = slope_ms(lambda: lookup.fused_lookup(qclip, tabA))
    print(f"lookup bf16x2 A={A}:      {t:7.2f} ms", flush=True)
    # exactness across variants/windows on real hardware
    ref = np.asarray(lookup.fused_lookup(qual, tab256))
    for got, tag in ((lookup.fused_lookup_pallas(qual, tab256, interp), "pl256"),
                     (lookup.fused_lookup_pallas(qclip, tabA, interp), "plA"),
                     (lookup.fused_lookup(qclip, tabA), "bfA")):
        assert (np.asarray(got) == ref).all(), f"lookup mismatch: {tag}"
    lookup.VARIANT = "auto"
    print("lookup exactness: OK", flush=True)

    # -- 2. full quality encode graph -------------------------------------
    qc = jax.device_put(tables.codes)
    ql = jax.device_put(tables.lens)
    qcA = jax.device_put(np.ascontiguousarray(tables.codes[:, off:off + A]))
    qlA = jax.device_put(np.ascontiguousarray(tables.lens[:, off:off + A]))
    cap = sbmod._word_cap(R, L, G)
    for pack in ("rows", "rows_compact"):
        t = slope_ms(lambda: quality.encode_device(
            qual, lens, qc, ql, G, cap, q_group, pack)[0])
        print(f"q encode {pack:13s} full: {t:7.2f} ms", flush=True)
        t = slope_ms(lambda: quality.encode_device(
            qual, lens, qcA, qlA, G, cap, q_group, pack,
            jnp.int32(off))[0])
        print(f"q encode {pack:13s} win:  {t:7.2f} ms", flush=True)

    # -- 3. compact_rows alone --------------------------------------------
    plane, sub, _tot = quality.encode_device(
        qual, lens, qcA, qlA, G, cap, q_group, "rows", jnp.int32(off))
    plane = jax.device_put(np.asarray(plane))
    sub = jax.device_put(np.asarray(sub))
    t = slope_ms(lambda: bitpack.compact_rows(plane, sub, cap))
    print(f"compact_rows:            {t:7.2f} ms  (S,T)={tuple(plane.shape)}",
          flush=True)

    # -- 4. densify: sorts vs DMA copies ----------------------------------
    lin = np.asarray(bitpack.compact_rows(plane, sub, cap))
    sub_np = np.asarray(sub)
    Wmax, Sp = bitpack.dense_geometry(sub_np)
    lin_j = jax.device_put(lin)
    print(f"dense geometry: Wmax={Wmax} Sp={Sp}", flush=True)
    t = slope_ms(lambda: bitpack.dense_words_device(lin_j, sub, Wmax, Sp))
    print(f"dense sorts:             {t:7.2f} ms", flush=True)
    t = slope_ms(lambda: bitpack.dense_words_pallas(lin_j, sub, Wmax, Sp, interp))
    print(f"dense pallas DMA:        {t:7.2f} ms", flush=True)
    refp = np.asarray(bitpack.dense_words_device(lin_j, sub, Wmax, Sp))
    gotp = np.asarray(bitpack.dense_words_pallas(lin_j, sub, Wmax, Sp, interp))
    sub_pad = np.zeros(Sp, np.int32)
    sub_pad[: sub_np.shape[0]] = sub_np
    vmask = np.arange(Wmax)[:, None] < sub_pad[None, :]
    assert (gotp[vmask] == refp[vmask]).all(), "densify mismatch on TPU"
    print("densify exactness: OK", flush=True)

    # -- 5. e2e pipeline roundtrip + fused decode slope --------------------
    from phyngsc_tpu.container import block as blockmod
    from phyngsc_tpu.container import footer as footermod
    from phyngsc_tpu.pipeline.compress import compress_bytes
    from phyngsc_tpu.pipeline.decompress import decompress_bytes

    acgt = np.frombuffer(b"ACGT", np.uint8)
    n_rec = 120_000
    seqs = acgt[rng.integers(0, 4, size=(n_rec, 36))]
    quals = rng.integers(33, 74, size=(n_rec, 36)).astype(np.uint8)
    recs = []
    for i in range(n_rec):
        recs.append(b"@ERR005195.%d FC:1:1:100:200\n" % i
                    + seqs[i].tobytes() + b"\n+\n" + quals[i].tobytes()
                    + b"\n")
    data = b"".join(recs)
    print(f"e2e input: {len(data)/1e6:.1f} MB", flush=True)
    t0 = time.perf_counter()
    comp = compress_bytes(data, cfg)
    t1 = time.perf_counter()
    out = decompress_bytes(comp, cfg)
    t2 = time.perf_counter()
    assert out == data, "ROUNDTRIP FAILED"
    print(f"roundtrip OK ratio={len(data)/len(comp):.3f} "
          f"comp={t1-t0:.2f}s decomp={t2-t1:.2f}s", flush=True)

    foot = footermod.read_footer(comp)
    sizes = foot.block_sizes_in_file_order()

    def blocks():
        o = 0
        for size, wid in zip(sizes, foot.cbo):
            yield wid, bytes(comp[o : o + size])
            o += size

    payload = next(iter(blockmod.iter_subblocks(blocks())))[1]
    p = sbmod._decode_parse(payload, cfg)
    dev_in = sbmod._decode_device_inputs(p, cfg)
    np.asarray(sbmod._decode_device(p, dev_in, cfg))
    t = slope_ms(lambda: sbmod._decode_device(p, dev_in, cfg))
    rec_bytes = len(data) / n_rec
    print(f"fused decode: {t:7.2f} ms/sub-block (R={p.R}) "
          f"=> {p.R * rec_bytes / t / 1e3:6.1f} MB/s", flush=True)
    print(f"total wall {time.perf_counter()-t_start:.1f}s", flush=True)


if __name__ == "__main__":
    main()
