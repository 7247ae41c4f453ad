"""On-chip probe: scatter-free bitpack candidates vs pack_bits_scatter.

Idea: within a substream, word indices (bit_offset >> 5) are non-decreasing
with increments in {0, 1} (grouped elements are <= 32 bits). Each output
word is a contiguous-run sum of per-element hi/lo word contributions, and a
contiguous-run sum equals a difference of (wrapping uint32) cumsums at the
run boundaries. The run-end cumsum values are compacted to dense word rows
with one stable sort by end-flag (vectorized over substreams) — no scatter,
no gather.

Run as ONE process on the TPU backend; exits naturally (relay discipline).
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

from phyngsc_tpu.ops import bitpack  # noqa: E402

WORD_BITS = 32


# --- candidate B: sort-compaction rows pack ---------------------------------

def _rows_core(codes, lens, G):
    R, Lg = codes.shape
    S = R // G
    T = G * Lg
    c = codes.reshape(S, T).astype(jnp.uint32)
    l = lens.reshape(S, T).astype(jnp.int32)
    csum = jnp.cumsum(l, axis=1)
    off = csum - l                                   # exclusive, within-lane
    wmat = off >> 5
    b = off & 31
    hi, lo = bitpack._split_two_words(c, l, b)
    chi = jnp.cumsum(hi, axis=1)                     # wrapping uint32
    clo = jnp.cumsum(lo, axis=1)
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :]
    wnext = jnp.concatenate(
        [wmat[:, 1:], jnp.full((S, 1), T + 1, jnp.int32)], axis=1)
    flag = wnext != wmat
    key = jnp.where(flag, t_iota, T + t_iota)        # unique keys per lane
    _, a_s, b_s = jax.lax.sort((key, chi, clo), dimension=1, num_keys=1)
    A = a_s
    B = b_s
    A_p = jnp.pad(A, ((0, 0), (1, 0)))[:, :-1]
    B_p = jnp.pad(B, ((0, 0), (1, 0)))[:, :-1]
    B_p2 = jnp.pad(B, ((0, 0), (2, 0)))[:, :-2]
    # word w = hi-run (A[w]-A[w-1]) + lo-run (B[w-1]-B[w-2]). Row w of A/B is
    # only valid for w <= last starter word; the final word may receive only
    # a spill (no element starts in it) — there its value is the lo part
    # alone, whose B rows (w-1, w-2) are still valid.
    last_w = wmat[:, -1][:, None]                    # (S, 1)
    col = jnp.arange(T, dtype=jnp.int32)[None, :]
    hi_part = A - A_p
    lo_part = B_p - B_p2
    words = jnp.where(col <= last_w, hi_part + lo_part, lo_part)
    sub_bits = csum[:, -1]
    sub_n_words = (sub_bits + 31) // 32
    return words.astype(jnp.uint32), sub_n_words.astype(jnp.int32)


rows_pack = jax.jit(_rows_core, static_argnames=("G",))


# --- candidate C: binary-search idx + take_along_axis compaction ------------

def _tala_core(codes, lens, G):
    R, Lg = codes.shape
    S = R // G
    T = G * Lg
    c = codes.reshape(S, T).astype(jnp.uint32)
    l = lens.reshape(S, T).astype(jnp.int32)
    csum = jnp.cumsum(l, axis=1)
    off = csum - l
    wmat = off >> 5
    b = off & 31
    hi, lo = bitpack._split_two_words(c, l, b)
    chi = jnp.cumsum(hi, axis=1)
    clo = jnp.cumsum(lo, axis=1)
    # idx[w,s] = last t with wmat[t]<=w  (== number of t with wmat<=w, -1)
    W = T
    wt = jnp.arange(W, dtype=jnp.int32)[None, :]     # (1, W)
    lo_i = jnp.zeros((S, W), jnp.int32)
    hi_i = jnp.full((S, W), T - 1, jnp.int32)
    n_rounds = int(np.ceil(np.log2(max(T, 2)))) + 1
    for _ in range(n_rounds):
        mid = (lo_i + hi_i + 1) // 2
        v = jnp.take_along_axis(wmat, mid, axis=1)
        ok = v <= wt
        lo_i = jnp.where(ok, mid, lo_i)
        hi_i = jnp.where(ok, hi_i, mid - 1)
    idx = lo_i
    A = jnp.take_along_axis(chi, idx, axis=1)
    B = jnp.take_along_axis(clo, idx, axis=1)
    A_p = jnp.pad(A, ((0, 0), (1, 0)))[:, :-1]
    B_p = jnp.pad(B, ((0, 0), (1, 0)))[:, :-1]
    B_p2 = jnp.pad(B, ((0, 0), (2, 0)))[:, :-2]
    words = (A - A_p) + (B_p - B_p2)
    sub_bits = csum[:, -1]
    return words.astype(jnp.uint32), ((sub_bits + 31) // 32).astype(jnp.int32)


tala_pack = jax.jit(_tala_core, static_argnames=("G",))


# --- candidate D: 2D scatter into row plane ---------------------------------

def _scat2d_core(codes, lens, G):
    R, Lg = codes.shape
    S = R // G
    T = G * Lg
    c = codes.reshape(S, T).astype(jnp.uint32)
    l = lens.reshape(S, T).astype(jnp.int32)
    csum = jnp.cumsum(l, axis=1)
    off = csum - l
    wmat = off >> 5
    b = off & 31
    hi, lo = bitpack._split_two_words(c, l, b)
    lane = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, T))
    plane = jnp.zeros((S, T + 1), jnp.uint32)
    plane = plane.at[lane, wmat].add(hi, mode="drop")
    plane = plane.at[lane, wmat + 1].add(lo, mode="drop")
    return plane[:, :T], ((csum[:, -1] + 31) // 32).astype(jnp.int32)


scat2d_pack = jax.jit(_scat2d_core, static_argnames=("G",))


# --- control -----------------------------------------------------------------

def control(codes, lens, G, cap):
    lay = bitpack.substream_layout(lens, G)
    words = bitpack.pack_bits_scatter(codes, lens, lay["bit_offsets"], cap)
    return words, lay


def bench(fn, *args, n=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3, r


def make_inputs(R, Lg, seed, zero_frac=0.0):
    rng = np.random.default_rng(seed)
    # realistic grouped quality codes: 4 codes of 2-8 bits -> 8-32 bits/elem
    lens = rng.integers(8, 33, size=(R, Lg)).astype(np.int32)
    if zero_frac:
        lens[rng.random((R, Lg)) < zero_frac] = 0
    codes = (rng.integers(0, 1 << 31, size=(R, Lg)).astype(np.uint64)
             & ((1 << lens.astype(np.uint64)) - 1)).astype(np.uint32)
    return jnp.array(codes), jnp.array(lens)


def verify(plane, subw, lin_words, lay, S):
    plane = np.asarray(plane)
    subw = np.asarray(subw)
    lin = np.asarray(lin_words)
    start = np.asarray(lay["sub_word_start"])
    refw = np.asarray(lay["sub_n_words"])
    assert np.array_equal(subw, refw), "sub_n_words mismatch"
    for s in range(S):
        n = int(refw[s])
        if not np.array_equal(plane[s, :n], lin[start[s]: start[s] + n]):
            bad = np.nonzero(plane[s, :n] != lin[start[s]: start[s] + n])[0]
            return f"lane {s} words differ at {bad[:5]}"
    return "OK"


def main():
    dev = jax.devices()[0]
    print("backend:", dev.platform, dev)
    R, G = 65536, 64
    for Lg, tag in ((9, "k=4 (65536,9)"), (18, "k=2 (65536,18)")):
        S = R // G
        codes, lens = make_inputs(R, Lg, seed=1, zero_frac=0.05)
        lay_np = bitpack.substream_layout_np(np.asarray(lens), G)
        cap = int(lay_np["total_words"]) + 8
        ms_c, (lin, lay) = bench(control, codes, lens, G, cap)
        ms_b, (pb, wb) = bench(rows_pack, codes, lens, G)
        ms_t, (pt, wt) = bench(tala_pack, codes, lens, G)
        ms_d, (pd, wd) = bench(scat2d_pack, codes, lens, G)
        print(f"--- {tag}: control scatter {ms_c:.2f} ms | rows-sort {ms_b:.2f}"
              f" ms | tala-bsearch {ms_t:.2f} ms | scat2d {ms_d:.2f} ms")
        print("  rows-sort:", verify(pb, wb, lin, lay, S))
        print("  tala     :", verify(pt, wt, lin, lay, S))
        print("  scat2d   :", verify(pd, wd, lin, lay, S))


if __name__ == "__main__":
    main()
