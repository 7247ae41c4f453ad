"""Lookup-kernel shootout on the real chip (one process — relay discipline).

Hypothesis: fused_lookup's 5 ms is one-hot HBM traffic, not FLOPs. The
(chunk, L, 256) bf16 one-hot is 75 MB/chunk, written once and read twice
(lo + hi dots) -> ~3.6 GB of HBM traffic at 2.36M symbols. Variants:

  v0  current: bf16 one-hot, two dots (lo 8b, hi 8b planes)
  v1  merged:  bf16 one-hot, ONE dot with (L, A, 2) stacked planes (N=2)
  v2  f32 single-plane: fused entries < 2^16 are exact in f32 -> one dot
  v3  int8 one-hot x int8 planes (6/6/4 bits, N=3) -> int32 accum
  v4  select-tree: 8-level where-chain on the int32 table (VPU, no MXU)
  v5  chunk sweep on the winner
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

import functools

from phyngsc_tpu.ops import lookup

R, L, A = 65536, 36, 256


def bench(label, fn, *args, n=10, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:46s} {ms:8.2f} ms", flush=True)
    return r


@functools.partial(jax.jit, static_argnames=("chunk",))
def v1_merged(symbols, fused_tab, chunk=4096):
    Rl, Ll = symbols.shape
    Al = fused_tab.shape[1]
    lo = (fused_tab & 0xFF).astype(jnp.bfloat16)
    hi = ((fused_tab >> 8) & 0xFF).astype(jnp.bfloat16)
    tab2 = jnp.stack([lo, hi], axis=-1)            # (L, A, 2)
    pad = (-Rl) % chunk
    sym = jnp.pad(symbols.astype(jnp.int32), ((0, pad), (0, 0)))
    ids = jnp.arange(Al, dtype=jnp.int32)

    def step(carry, s_ch):
        oh = (s_ch[:, :, None] == ids[None, None, :]).astype(jnp.bfloat16)
        v = jax.lax.dot_general(oh, tab2, (((2,), (1,)), ((1,), (0,))),
                                preferred_element_type=jnp.float32)
        # v: (L, chunk, 2)
        vi = v.astype(jnp.int32)
        return carry, vi[..., 0] | (vi[..., 1] << 8)

    n_ch = sym.shape[0] // chunk
    _, fused = jax.lax.scan(step, 0, sym.reshape(n_ch, chunk, Ll))
    return fused.transpose(0, 2, 1).reshape(-1, Ll)[:Rl]


@functools.partial(jax.jit, static_argnames=("chunk",))
def v2_f32(symbols, fused_tab, chunk=4096):
    Rl, Ll = symbols.shape
    Al = fused_tab.shape[1]
    tab = fused_tab.astype(jnp.float32)            # exact: entries < 2^16
    pad = (-Rl) % chunk
    sym = jnp.pad(symbols.astype(jnp.int32), ((0, pad), (0, 0)))
    ids = jnp.arange(Al, dtype=jnp.int32)

    def step(carry, s_ch):
        oh = (s_ch[:, :, None] == ids[None, None, :]).astype(jnp.float32)
        v = jax.lax.dot_general(oh, tab, (((2,), (1,)), ((1,), (0,))),
                                preferred_element_type=jnp.float32)
        return carry, v.astype(jnp.int32)

    n_ch = sym.shape[0] // chunk
    _, fused = jax.lax.scan(step, 0, sym.reshape(n_ch, chunk, Ll))
    return fused.transpose(0, 2, 1).reshape(-1, Ll)[:Rl]


@functools.partial(jax.jit, static_argnames=("chunk",))
def v3_int8(symbols, fused_tab, chunk=4096):
    Rl, Ll = symbols.shape
    Al = fused_tab.shape[1]
    p0 = (fused_tab & 0x3F).astype(jnp.int8)
    p1 = ((fused_tab >> 6) & 0x3F).astype(jnp.int8)
    p2 = ((fused_tab >> 12) & 0x0F).astype(jnp.int8)
    tab3 = jnp.stack([p0, p1, p2], axis=-1)        # (L, A, 3)
    pad = (-Rl) % chunk
    sym = jnp.pad(symbols.astype(jnp.int32), ((0, pad), (0, 0)))
    ids = jnp.arange(Al, dtype=jnp.int32)

    def step(carry, s_ch):
        oh = (s_ch[:, :, None] == ids[None, None, :]).astype(jnp.int8)
        v = jax.lax.dot_general(oh, tab3, (((2,), (1,)), ((1,), (0,))),
                                preferred_element_type=jnp.int32)
        return carry, v[..., 0] | (v[..., 1] << 6) | (v[..., 2] << 12)

    n_ch = sym.shape[0] // chunk
    _, fused = jax.lax.scan(step, 0, sym.reshape(n_ch, chunk, Ll))
    return fused.transpose(0, 2, 1).reshape(-1, Ll)[:Rl]


@functools.partial(jax.jit, static_argnames=("chunk",))
def v4_select(symbols, fused_tab, chunk=8192):
    Rl, Ll = symbols.shape
    pad = (-Rl) % chunk
    sym = jnp.pad(symbols.astype(jnp.int32), ((0, pad), (0, 0)))

    def step(carry, s_ch):
        cur = jnp.broadcast_to(fused_tab[None], (s_ch.shape[0], Ll, 256))
        w = 128
        while w >= 1:
            bit = (s_ch >> int(np.log2(w))) & 1
            cur = jnp.where(bit[:, :, None] == 1, cur[:, :, w:], cur[:, :, :w])
            w //= 2
        return carry, cur[:, :, 0]

    n_ch = sym.shape[0] // chunk
    _, fused = jax.lax.scan(step, 0, sym.reshape(n_ch, chunk, Ll))
    return fused.reshape(-1, Ll)[:Rl]


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    # realistic quality-ish symbols: mostly 33..73, a few transferred >=128
    sym_np = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    amb = rng.random((R, L)) < 0.01
    sym_np[amb] = rng.integers(128, 248, size=int(amb.sum())).astype(np.uint8)
    # plausible fused table: len 2..12, code < 2^len
    lens_np = rng.integers(2, 13, size=(L, A)).astype(np.int64)
    codes_np = rng.integers(0, 1 << 20, size=(L, A)) & ((1 << lens_np) - 1)
    fused_np = ((lens_np << lookup.CODE_BITS) | codes_np).astype(np.int32)
    want = fused_np[np.arange(L)[None, :], sym_np.astype(np.int64)]

    sym = jnp.array(sym_np)
    tab = jnp.array(fused_np)

    results = {}
    r0 = bench("v0 current (bf16 2-dot, chunk 4096)", lookup.fused_lookup, sym, tab)
    results["v0"] = np.asarray(r0)
    r1 = bench("v1 merged  (bf16 1-dot N=2)", v1_merged, sym, tab)
    results["v1"] = np.asarray(r1)
    r2 = bench("v2 f32 single-plane", v2_f32, sym, tab)
    results["v2"] = np.asarray(r2)
    try:
        r3 = bench("v3 int8 3-plane", v3_int8, sym, tab)
        results["v3"] = np.asarray(r3)
    except Exception as e:  # int8 dot may not lower
        print("v3 int8 FAILED:", repr(e)[:200], flush=True)
    r4 = bench("v4 select-tree (chunk 8192)", v4_select, sym, tab)
    results["v4"] = np.asarray(r4)

    for k, v in results.items():
        ok = np.array_equal(v, want)
        print(f"  {k} exact: {ok}")

    # chunk sweep on the top-2 (decided by the printout; sweep all cheap ones)
    for ch in (2048, 8192, 16384):
        bench(f"v2 f32 chunk {ch}", v2_f32, sym, tab, chunk=ch)
    for ch in (2048, 8192, 16384):
        bench(f"v3 int8 chunk {ch}", v3_int8, sym, tab, chunk=ch)
    for ch in (2048, 4096, 16384, 32768):
        bench(f"v4 select chunk {ch}", v4_select, sym, tab, chunk=ch)

    # context: the full encode chain pieces at current shapes
    from phyngsc_tpu.ops import bitpack
    codes_j, lens_j = lookup.split_fused(jnp.array(want))
    pc, pl = lookup.group_codes(codes_j, lens_j, 2)
    jax.block_until_ready((pc, pl))
    bench("group_codes k=2", lookup.group_codes, codes_j, lens_j, 2)
    plane, sub, total = bitpack.pack_bits_rows(pc, pl, 64)
    jax.block_until_ready(plane)
    bench("pack_bits_rows G=64", bitpack.pack_bits_rows, pc, pl, 64)
    cap = int(np.asarray(total)) + 64
    cap = (cap + (1 << 14) - 1) // (1 << 14) * (1 << 14)
    bench("compact_rows", bitpack.compact_rows, plane, sub, cap)


if __name__ == "__main__":
    main()
