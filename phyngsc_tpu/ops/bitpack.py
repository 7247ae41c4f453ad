"""Device bit packing and unpacking — the TPU replacement for BitStream.

The reference emits variable-length codes one at a time through a 32-bit word
buffer (`BitStream::PutBits`, bit_stream.h:149-169) — inherently serial, and
its decode bit-walks a tree per symbol (huffman.h:189-213). Here both
directions are data-parallel:

Encode (`pack_bits_*`): every symbol i owns the bit span
[offset_i, offset_i + len_i) of the output, with offsets computed by exclusive
prefix sum. A symbol's bits land in at most two consecutive uint32 words
(len <= 16 < 32), so packing is either
  - 'scatter': two scatter-adds with sorted indices (disjoint spans make
    add == or), or
  - 'gather' : the transpose — each output word gathers the <= K symbols whose
    spans intersect it (searchsorted for the first, K-step unrolled OR-reduce).
Both are pure jnp, fully vectorized, jit-compatible, identical outputs.

Decode (`unpack_substreams`): entropy decode is sequential *per stream*, so the
format cuts each stream into many independent substreams (contiguous record
ranges, word-aligned starts; offsets stored in the stream header). Decode then
vectorizes across substreams — each VPU lane walks one substream via a packed
LUT (sym|len in one int32 → one gather per step) inside a `fori_loop`.

Bit order is MSB-first within words and words are in-order, so the byte image
equals the host BitWriter's layout for the same bit sequence (words serialized
big-endian).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WORD_BITS = 32

#: Device-densify strategy for the decode walk planes, resolved ONCE at
#: import (dense_words is traced inside the fused decode executable, so a
#: later env change could never reach already-compiled shapes — same
#: contract as lookup.VARIANT; ADVICE r3 #1):
#:   - "banded": group-banded WIRE layout (banded_words_np on host,
#:     dense_words_banded on device) — the plane build is dynamic slices +
#:     updates, no sorts and no gathers. Default: the two global sorts were
#:     the measured decode bottleneck (BENCH_r03 device decode 200 MB/s vs
#:     walk-only ~1 GB/s; VERDICT r3 next #1).
#:   - "sorts": linear wire layout + two stable global sorts (the r3 path).
#:   - "dma":   EXPERIMENTAL pallas DMA-copy kernel over the linear layout
#:     (current Mosaic rejects unaligned 1-D DMA slices; kept for
#:     interpret-mode tests and future toolchains)
DENSIFY = os.environ.get("PHYNGSC_DENSIFY", "banded")

#: Lanes per band group of the banded wire layout. Each group of 8 adjacent
#: substreams ships band-major (word index major, lane minor) padded to the
#: group's max word count; adjacent substreams are adjacent records with
#: near-identical compressed sizes, so the measured padding is ~1-4% of the
#: payload — far cheaper than either the (Wmax, Sp) full plane (1.8-2.3x)
#: or the on-device sorts the linear layout needs.
DENSE_GROUP = 8


def pack_lut(sym: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Pack decode-LUT (sym, len) pairs into one int32: (len << 9) | sym."""
    return (length.astype(jnp.int32) << 9) | sym.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Layout: symbol bit offsets with word-aligned substream starts
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("records_per_substream",))
def substream_layout(lens2d: jnp.ndarray, records_per_substream: int):
    """Compute bit offsets for (R, L) per-symbol code lengths.

    Records are grouped into substreams of `records_per_substream` consecutive
    records (R must be a multiple; pad with zero-length records). Each
    substream's bits start at a fresh word boundary so substreams decode
    independently.

    Returns dict with:
      bit_offsets (R, L) int32 — absolute bit position of each symbol
      sub_n_words (S,) int32  — words used by each substream
      sub_word_start (S,) int32 — exclusive prefix sum of sub_n_words
      total_words () int32
    """
    R, L = lens2d.shape
    G = records_per_substream
    assert R % G == 0, "pad R to a multiple of records_per_substream"
    S = R // G
    lens = lens2d.astype(jnp.int32)
    rec_bits = jnp.sum(lens, axis=1)                      # (R,)
    sub_bits = jnp.sum(rec_bits.reshape(S, G), axis=1)    # (S,)
    sub_n_words = (sub_bits + WORD_BITS - 1) // WORD_BITS
    sub_word_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(sub_n_words)[:-1].astype(jnp.int32)]
    )
    # within-substream exclusive cumsum over the (G*L,) flattened lens
    flat = lens.reshape(S, G * L)
    within = jnp.cumsum(flat, axis=1) - flat              # exclusive
    bit_offsets = (within + (sub_word_start * WORD_BITS)[:, None]).reshape(R, L)
    total_words = sub_word_start[-1] + sub_n_words[-1] if S > 0 else jnp.int32(0)
    return {
        "bit_offsets": bit_offsets.astype(jnp.int32),
        "sub_n_words": sub_n_words.astype(jnp.int32),
        "sub_word_start": sub_word_start.astype(jnp.int32),
        "total_words": total_words.astype(jnp.int32),
    }


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

def _split_two_words(codes, lens, bit_in_word):
    """Split each code into (hi, lo) contributions for words (w, w+1).

    bit_in_word = offset & 31 (0 == MSB). Shift amounts stay in [0, 31];
    len == 0 contributes nothing.
    """
    codes = codes.astype(jnp.uint32)
    lens = lens.astype(jnp.int32)
    r = WORD_BITS - bit_in_word  # bits available in the first word, in [1, 32]
    fits = lens <= r
    sh_hi_l = jnp.clip(r - lens, 0, 31)       # left shift when it fits
    sh_hi_r = jnp.clip(lens - r, 0, 31)       # right shift when it spills
    hi = jnp.where(fits, codes << sh_hi_l.astype(jnp.uint32),
                   codes >> sh_hi_r.astype(jnp.uint32))
    sh_lo = jnp.clip(WORD_BITS - (lens - r), 1, 31).astype(jnp.uint32)
    lo = jnp.where(fits, jnp.uint32(0), codes << sh_lo)
    zero = lens == 0
    return jnp.where(zero, 0, hi), jnp.where(zero, 0, lo)


@functools.partial(jax.jit, static_argnames=("n_words",))
def pack_bits_scatter(codes: jnp.ndarray, lens: jnp.ndarray,
                      bit_offsets: jnp.ndarray, n_words: int) -> jnp.ndarray:
    """Scatter-mode bitpack: (N,) codes/lens/offsets -> (n_words,) uint32."""
    codes = codes.reshape(-1)
    lens = lens.reshape(-1)
    bit_offsets = bit_offsets.reshape(-1)
    w = (bit_offsets // WORD_BITS).astype(jnp.int32)
    b = (bit_offsets % WORD_BITS).astype(jnp.int32)
    hi, lo = _split_two_words(codes, lens, b)
    # zero-length elements (padding) can sit exactly at the buffer end
    # (w == n_words when the cap is an exact fit); clamping — rather than
    # redirecting to 0 — keeps the index sequence monotone, which
    # indices_are_sorted promises. For len>0, offset+len <= 32*n_words by
    # construction, so w < n_words and w+1 <= n_words — both scatters are
    # provably in bounds and the per-element bounds check can be skipped.
    w = jnp.minimum(w, n_words - 1)
    words = jnp.zeros((n_words + 1,), jnp.uint32)
    # disjoint bit spans → add == or; indices are monotonically non-decreasing
    words = words.at[w].add(hi, mode="promise_in_bounds", indices_are_sorted=True)
    words = words.at[w + 1].add(lo, mode="promise_in_bounds", indices_are_sorted=True)
    return words[:n_words]


def pack_mode() -> str:
    """Pick the bitpack kernel for the current backend.

    - "rows": sort-compaction pack, 4-6x faster than scatter on TPU
      (measured: 13.7 -> 3.3 ms at (65536,9) grouped, 24.4 -> 4.3 ms at
      (65536,18) on v5e). Output is a padded (S, T) row plane the host
      trims — the right default for PCIe-attached hosts where the extra
      fetched bytes are ~free.
    - "rows_compact": rows + one on-device global sort compacting the plane
      into the exact-cap linear buffer — minimal device->host bytes, for
      bandwidth-poor links (this dev harness's loopback relay).
    - "scatter": two sorted scatter-adds; XLA:CPU's native scatter beats its
      sort, so CPU defaults here.

    PHYNGSC_PACK=rows|rows_compact|scatter overrides.
    """
    mode = os.environ.get("PHYNGSC_PACK", "auto")
    if mode in ("rows", "rows_compact", "scatter"):
        return mode
    return "rows_compact" if jax.default_backend() == "tpu" else "scatter"


@functools.partial(jax.jit, static_argnames=("records_per_substream",))
def pack_bits_rows(codes: jnp.ndarray, lens: jnp.ndarray,
                   records_per_substream: int):
    """Scatter-free bitpack into a per-substream row plane.

    (R, Lg) grouped codes/lens (every element <= 32 bits) → (S, T) uint32
    plane where row s holds substream s's packed words (columns past
    sub_n_words[s] are garbage; the host trims and concatenates rows into
    the dense stream — byte-identical to pack_bits_scatter's output for the
    same substream_layout).

    Within a substream, word indices (bit_offset >> 5) are non-decreasing
    with increments in {0, 1}, so each output word is a *contiguous run* of
    per-element word contributions, and a contiguous-run sum equals a
    difference of wrapping uint32 cumsums at the run ends (disjoint bit
    spans make add == or, and mod-2^32 differences are exact). Run-end
    cumsum values are compacted to dense word rows by one sort per lane on
    unique keys — no scatter, no gather, the two primitives XLA:TPU
    serializes (DESIGN.md measured-performance).

    Returns (plane (S, T) uint32, sub_n_words (S,) int32, total_words).
    """
    R, Lg = codes.shape
    G = records_per_substream
    assert R % G == 0, "pad R to a multiple of records_per_substream"
    S = R // G
    T = G * Lg
    c = codes.reshape(S, T).astype(jnp.uint32)
    l = lens.reshape(S, T).astype(jnp.int32)
    csum = jnp.cumsum(l, axis=1)
    off = csum - l                                   # exclusive, within-lane
    wmat = off >> 5
    hi, lo = _split_two_words(c, l, off & 31)
    chi = jnp.cumsum(hi, axis=1)                     # wrapping uint32
    clo = jnp.cumsum(lo, axis=1)
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :]
    wnext = jnp.concatenate(
        [wmat[:, 1:], jnp.full((S, 1), T + 1, jnp.int32)], axis=1)
    # run-end steps, keyed by step index (unique per lane) so the sort is
    # deterministic without stability; non-ends pushed past column T-1
    key = jnp.where(wnext != wmat, t_iota, T + t_iota)
    _, A, B = jax.lax.sort((key, chi, clo), dimension=1, num_keys=1)
    A_p = jnp.pad(A, ((0, 0), (1, 0)))[:, :-1]
    B_p = jnp.pad(B, ((0, 0), (1, 0)))[:, :-1]
    B_p2 = jnp.pad(B, ((0, 0), (2, 0)))[:, :-2]
    # word w = hi-run (A[w] - A[w-1]) + spill-run (B[w-1] - B[w-2]). Rows of
    # A/B past the last *starter* word hold non-end garbage; the one word
    # that can lack a starter is a final spill-only word, where the value is
    # the spill part alone (its B rows are still valid).
    last_w = wmat[:, -1][:, None]
    words = jnp.where(t_iota <= last_w, (A - A_p) + (B_p - B_p2), B_p - B_p2)
    sub_n_words = ((csum[:, -1] + 31) // 32).astype(jnp.int32)
    total = jnp.sum(sub_n_words)
    return words.astype(jnp.uint32), sub_n_words, total


#: rows-plane compaction strategy, resolved ONCE at import (same contract
#: as DENSIFY/lookup.VARIANT): "sort" (default) — one global sort; "dus" —
#: ascending per-lane dynamic-update-slice overwrite. Measured r4 on v5e:
#: standalone the DUS loop wins (1.92 vs 3.88 ms at (1024, 512)), but
#: inside the fused encode graph its sequential carry chain blocks the
#: overlap XLA finds around the sort (e2e 627 vs 757 MB/s) — so sort
#: stays the default and dus is the recorded alternative. Both produce
#: identical valid words; [total, cap) is unspecified slack either way.
COMPACT = os.environ.get("PHYNGSC_COMPACT", "sort")


def compact_rows(plane: jnp.ndarray, sub_n_words: jnp.ndarray,
                 n_words_cap: int) -> jnp.ndarray:
    """Device compaction of a pack_bits_rows plane to the dense linear
    stream (strategy-selected, see COMPACT). Words in [total_words,
    n_words_cap) are cap slack, as in pack_bits_scatter; callers trim with
    the returned totals."""
    if COMPACT == "sort":
        return compact_rows_sort(plane, sub_n_words, n_words_cap)
    return compact_rows_dus(plane, sub_n_words, n_words_cap)


@functools.partial(jax.jit, static_argnames=("n_words_cap",))
def compact_rows_sort(plane: jnp.ndarray, sub_n_words: jnp.ndarray,
                      n_words_cap: int) -> jnp.ndarray:
    """Sort-based compaction: one global sort on unique word-index keys
    (invalid slots pushed past the end)."""
    S, T = plane.shape
    sub = sub_n_words.astype(jnp.int32)
    start = (jnp.cumsum(sub) - sub)[:, None]
    col = jnp.arange(T, dtype=jnp.int32)[None, :]
    key = jnp.where(col < sub[:, None], start + col, jnp.int32(0x7FFFFFFF))
    _, v = jax.lax.sort((key.reshape(-1), plane.reshape(-1)),
                        dimension=0, num_keys=1)
    if v.shape[0] < n_words_cap:
        # a bucketed cap can exceed the plane on small sub-blocks; the slack
        # is trimmed by the caller either way
        return jnp.pad(v, (0, n_words_cap - v.shape[0]))
    return v[:n_words_cap]


@functools.partial(jax.jit, static_argnames=("n_words_cap",))
def compact_rows_dus(plane: jnp.ndarray, sub_n_words: jnp.ndarray,
                     n_words_cap: int) -> jnp.ndarray:
    """Sort-free compaction: write each lane's T-word row at its exclusive
    prefix start in ASCENDING lane order — lane s's garbage tail (columns
    past sub[s]) lands exactly where lanes s+1.. write next, so the final
    buffer's valid region equals the sorted compaction's (the same
    overwrite trick as the decode-side banded plane build, in reverse).
    The last lane's tail spills into dedicated scratch past the cap."""
    S, T = plane.shape
    sub = sub_n_words.astype(jnp.int32)
    start = jnp.cumsum(sub) - sub

    def body(s, b):
        row = jax.lax.dynamic_slice(plane, (s, 0), (1, T)).reshape(T)
        return jax.lax.dynamic_update_slice(b, row, (start[s],))

    buf = jax.lax.fori_loop(
        0, S, body, jnp.zeros((n_words_cap + T,), jnp.uint32))
    return buf[:n_words_cap]


def trim_rows_np(plane: np.ndarray, sub_n_words: np.ndarray) -> np.ndarray:
    """Host compaction of a pack_bits_rows plane: concat row s's first
    sub_n_words[s] words (the dense stream, = pack_bits_scatter output).
    One boolean-mask flatten — row-major selection preserves (row, column)
    order, so no per-substream Python iteration (S can be 1024+)."""
    plane = np.asarray(plane)
    if not plane.shape[0]:
        return np.zeros(0, np.uint32)
    n = np.asarray(sub_n_words).astype(np.int64)
    mask = np.arange(plane.shape[1], dtype=np.int64)[None, :] < n[:, None]
    return plane[mask]


def substream_layout_np(lens2d: np.ndarray, records_per_substream: int):
    R, L = lens2d.shape
    G = records_per_substream
    assert R % G == 0
    S = R // G
    lens = lens2d.astype(np.int64)
    sub_bits = lens.reshape(S, G * L).sum(axis=1)
    sub_n_words = (sub_bits + WORD_BITS - 1) // WORD_BITS
    sub_word_start = np.concatenate([[0], np.cumsum(sub_n_words)[:-1]])
    flat = lens.reshape(S, G * L)
    within = np.cumsum(flat, axis=1) - flat
    bit_offsets = (within + (sub_word_start * WORD_BITS)[:, None]).reshape(R, L)
    total = int(sub_word_start[-1] + sub_n_words[-1]) if S else 0
    return {
        "bit_offsets": bit_offsets.astype(np.int64),
        "sub_n_words": sub_n_words.astype(np.int32),
        "sub_word_start": sub_word_start.astype(np.int64),
        "total_words": total,
    }

def pack_bits_scatter_np(codes: np.ndarray, lens: np.ndarray,
                         bit_offsets: np.ndarray, n_words: int) -> np.ndarray:
    codes = codes.reshape(-1).astype(np.uint64)
    lens = lens.reshape(-1).astype(np.int64)
    off = bit_offsets.reshape(-1).astype(np.int64)
    w = off >> 5
    b = off & 31
    r = 32 - b
    fits = lens <= r
    sh_l = np.maximum(r - lens, 0).astype(np.uint64)
    sh_r = np.maximum(lens - r, 0).astype(np.uint64)
    sh_lo = np.clip(32 - (lens - r), 0, 63).astype(np.uint64)
    hi = np.where(fits, codes << sh_l, codes >> sh_r) & np.uint64(0xFFFFFFFF)
    lo = np.where(fits, np.uint64(0), (codes << sh_lo) & np.uint64(0xFFFFFFFF))
    nz = lens > 0
    words = np.zeros(n_words + 1, np.uint64)
    np.add.at(words, w[nz], hi[nz])
    np.add.at(words, np.minimum(w[nz] + 1, n_words), lo[nz])
    return words[:n_words].astype(np.uint32)


def extract_fixed_width_np(words: np.ndarray, bit_offsets: np.ndarray,
                           widths: np.ndarray) -> np.ndarray:
    words = np.concatenate([words.astype(np.uint64), np.zeros(2, np.uint64)])
    o = bit_offsets.astype(np.int64)
    w = o >> 5
    b = (o & 31).astype(np.uint64)
    n = words.shape[0]
    w1 = words[np.clip(w, 0, n - 1)]
    w2 = words[np.clip(w + 1, 0, n - 1)]
    win = ((w1 << b) | (w2 >> (np.uint64(32) - b))) & np.uint64(0xFFFFFFFF)
    win = np.where(b == 0, w1, win)
    width = widths.astype(np.uint64)
    shifted = win >> (np.uint64(32) - np.maximum(width, 1))
    return np.where(width == 0, 0,
                    shifted & ((np.uint64(1) << width) - np.uint64(1))).astype(np.uint32)


def unpack_substreams_np(words: np.ndarray, sub_word_start: np.ndarray,
                         luts: np.ndarray, tree_ids: np.ndarray,
                         valid: np.ndarray, n_steps: int, lut_bits: int):
    """Host decode walk: native OpenMP twin when available (no per-step
    Python iteration — n_steps is O(title chars/substream) on real variable
    titles), numpy fallback otherwise. Both bit-identical to
    unpack_substreams."""
    from phyngsc_tpu.utils import native

    out = native.unpack_substreams(
        np.concatenate([np.asarray(words, np.uint32),
                        np.zeros(2, np.uint32)]),
        np.asarray(sub_word_start, np.int64), np.asarray(luts),
        np.asarray(tree_ids), np.asarray(valid), n_steps, lut_bits)
    if out is not None:
        return out
    return _unpack_substreams_py(words, sub_word_start, luts, tree_ids,
                                 valid, n_steps, lut_bits)


def _unpack_substreams_py(words: np.ndarray, sub_word_start: np.ndarray,
                          luts: np.ndarray, tree_ids: np.ndarray,
                          valid: np.ndarray, n_steps: int, lut_bits: int):
    """Vectorized-over-substreams numpy fallback (per-step Python loop)."""
    S = sub_word_start.shape[0]
    words = np.concatenate([words.astype(np.uint64), np.zeros(2, np.uint64)])
    n = words.shape[0]
    word_idx = np.zeros(S, np.int64)
    bit_idx = np.zeros(S, np.int64)
    out = np.zeros((S, n_steps), np.int32)
    base0 = sub_word_start.astype(np.int64)
    for t in range(n_steps):
        base = base0 + word_idx
        w1 = words[np.clip(base, 0, n - 1)]
        w2 = words[np.clip(base + 1, 0, n - 1)]
        b = bit_idx.astype(np.uint64)
        win = ((w1 << b) | (w2 >> (np.uint64(32) - b))) & np.uint64(0xFFFFFFFF)
        win = np.where(bit_idx == 0, w1, win)
        idx = (win >> np.uint64(32 - lut_bits)).astype(np.int64)
        entry = luts[tree_ids[:, t], idx]
        out[:, t] = entry & 0x1FF
        l = np.where(valid[:, t], entry >> 9, 0)
        bit_idx = bit_idx + l
        word_idx = word_idx + (bit_idx >> 5)
        bit_idx = bit_idx & 31
    return out


def words_to_bytes(words: np.ndarray) -> bytes:
    """Serialize packed words big-endian (matches BitWriter's MSB-first bytes)."""
    return np.asarray(words, dtype=">u4").tobytes()


def bytes_to_words(data: bytes) -> np.ndarray:
    pad = (-len(data)) % 4
    if pad:
        data = data + b"\x00" * pad
    return np.frombuffer(data, dtype=">u4").astype(np.uint32)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_steps", "lut_bits"))
def unpack_substreams(words: jnp.ndarray, sub_word_start: jnp.ndarray,
                      luts: jnp.ndarray, tree_ids: jnp.ndarray,
                      valid: jnp.ndarray, n_steps: int, lut_bits: int):
    """Vectorized-over-substreams LUT decode.

    words          (W,) uint32      packed stream
    sub_word_start (S,) int32       word offset of each substream
    luts           (T, 2**lut_bits) int32 packed (len << 9 | sym) decode tables
    tree_ids       (S, n_steps) int32  which tree decodes step t of substream s
    valid          (S, n_steps) bool   mask of real symbols (False → no advance)
    Returns symbols (S, n_steps) int32.
    """
    S = sub_word_start.shape[0]
    # sentinel pad: keeps gathers in-bounds for empty/boundary streams
    # (zero-bit singleton trees can produce zero payload words)
    words = jnp.concatenate([words, jnp.zeros(2, jnp.uint32)])
    n_words = words.shape[0]
    # pre-widened (W, 2) rows: one row gather fetches both window words —
    # a row gather costs the same as a scalar gather (measured 9.1 vs
    # 9.8 ms/1M on v5e), cutting the walk's 3 gathers/step to 2
    wpair = jnp.stack(
        [words, jnp.concatenate([words[1:], jnp.zeros(1, jnp.uint32)])],
        axis=1)
    mask = jnp.uint32((1 << lut_bits) - 1)

    def body(t, state):
        word_idx, bit_idx, out = state
        base = jnp.clip(sub_word_start + word_idx, 0, n_words - 1)  # (S,)
        ww = wpair[base]
        w1, w2 = ww[:, 0], ww[:, 1]
        b = bit_idx.astype(jnp.uint32)
        win = jnp.where(
            bit_idx == 0, w1,
            (w1 << b) | (w2 >> (jnp.uint32(WORD_BITS) - b)),
        )
        idx = (win >> jnp.uint32(WORD_BITS - lut_bits)) & mask  # (S,)
        entry = luts[tree_ids[:, t], idx.astype(jnp.int32)]
        sym = entry & 0x1FF
        l = jnp.where(valid[:, t], entry >> 9, 0)
        out = out.at[:, t].set(sym)
        bit_idx = bit_idx + l
        word_idx = word_idx + (bit_idx // WORD_BITS)
        bit_idx = bit_idx % WORD_BITS
        return word_idx, bit_idx, out

    init = (
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((S, n_steps), jnp.int32),
    )
    _, _, out = jax.lax.fori_loop(0, n_steps, body, init)
    return out


@functools.partial(jax.jit, static_argnames=("n_steps2", "lut_bits2"))
def unpack_substreams_pairs(words: jnp.ndarray, sub_word_start: jnp.ndarray,
                            luts2: jnp.ndarray, tid2: jnp.ndarray,
                            n_steps2: int, lut_bits2: int):
    """Two-symbols-per-step LUT decode (gather-halving fast path).

    luts2 (P, 2**lut_bits2) int32 pair tables (huffman.pair_decode_lut
    layout: total_len<<18 | symB<<9 | symA; half/zero tables handle odd
    boundaries and exhausted substreams via tid2 — no validity operand).
    Returns packed entries (S, n_steps2) int32; callers split symA/symB and
    interleave. The single-symbol walk (unpack_substreams) measures
    ~36 ns/symbol on v5e regardless of substream count or LUT width — it is
    bound by its 3 gathers/step, so decoding 2 symbols per step is ~2x.
    """
    S = sub_word_start.shape[0]
    words = jnp.concatenate([words, jnp.zeros(2, jnp.uint32)])
    n_words = words.shape[0]
    # (W, 2) row gather: both window words in one gather (see
    # unpack_substreams) — measured 37.2 -> 25.4 ms on the bench shape
    wpair = jnp.stack(
        [words, jnp.concatenate([words[1:], jnp.zeros(1, jnp.uint32)])],
        axis=1)

    def body(t2, state):
        word_idx, bit_idx, out = state
        base = jnp.clip(sub_word_start + word_idx, 0, n_words - 1)
        ww = wpair[base]
        w1, w2 = ww[:, 0], ww[:, 1]
        b = bit_idx.astype(jnp.uint32)
        win = jnp.where(
            bit_idx == 0, w1,
            (w1 << b) | (w2 >> (jnp.uint32(WORD_BITS) - b)),
        )
        idx = (win >> jnp.uint32(WORD_BITS - lut_bits2)).astype(jnp.int32)
        entry = luts2[tid2[:, t2], idx]
        out = out.at[:, t2].set(entry & 0x3FFFF)
        bit_idx = bit_idx + (entry >> 18)
        word_idx = word_idx + (bit_idx // WORD_BITS)
        bit_idx = bit_idx % WORD_BITS
        return word_idx, bit_idx, out

    init = (
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((S, n_steps2), jnp.int32),
    )
    _, _, out = jax.lax.fori_loop(0, n_steps2, body, init)
    return out


# ---------------------------------------------------------------------------
# Pallas walk: the LUT decode without gathers.
#
# unpack_substreams costs ~36 ns/symbol on TPU regardless of S or lut_bits —
# XLA serializes its per-step gathers (window words + LUT row). This kernel
# keeps every operand VMEM-resident and replaces both gathers with VPU
# selects over generated iotas:
#   - window words: per-step dynamic-extent loop over the lanes' live word
#     range [min(word_idx), max(word_idx)+2) — advance per step is {0, 1}
#     word, so lanes stay in a narrow band;
#   - LUT entry: a (lanes, V) broadcast-compare × the step's LUT row,
#     reduced over V.
# Requirements (the uniform fast path): one LUT row per step shared by all
# lanes (true for per-position quality trees and the single DNA tree) and
# contiguous validity (step < per-substream total). Substream word areas are
# laid out densely per lane on the host — (Wmax, Sp) — so no per-lane base
# offsets exist in-kernel.
# ---------------------------------------------------------------------------

#: steps per grid block (output tile rows / LUT rows per block)
_WALK_TC = 128

#: per-STEP LUT-table cap: beyond G*L steps the (T, 256) run tables cost
#: hundreds of MB of HBM, so callers switch to PERIOD-tiled shared tables
#: (one record period tiled to the block size — quality.decode_device_walk;
#: VERDICT r4 next #2 lifts the old hard use_walk ceiling at this value)
WALK_PER_STEP_MAX = 16384


def _make_walk_kernel(lut_bits: int):
    """Uniform walk kernel: the per-step decode table arrives as canonical
    LUT RUNS — (starts, deltas) rows of K = 256 columns — and the entry is
    the cumulative-delta sum Σ delta_r·(idx >= start_r): 16x fewer compare
    columns than selecting from the 2^12 plane (lut_runs_device)."""

    def kernel(words_ref, starts_ref, deltas_ref, totals_ref, out_ref,
               wi_ref, bi_ref):
        k = pl.program_id(0)
        Tc = out_ref.shape[0]
        Wmax = words_ref.shape[0]
        K = starts_ref.shape[1]

        @pl.when(k == 0)
        def _():
            wi_ref[:] = jnp.zeros_like(wi_ref)
            bi_ref[:] = jnp.zeros_like(bi_ref)

        totals = totals_ref[:]
        # dead lanes (zero symbols: bucket padding past the real substreams)
        # never advance; leaving them in the band min would pin m = 0 and
        # make the fetch loop scan the whole consumed prefix every step —
        # measured 4x decode slowdown on sub-blocks with R < Rp
        live = totals > 0

        def step(i, _):
            wi = wi_ref[:]                           # (Sr, 128) int32
            bi = bi_ref[:]
            m = jnp.min(jnp.where(live, wi, jnp.int32(1) << 30))
            mx = jnp.max(jnp.where(live, wi, -1))
            span = jnp.minimum(mx + 2 - m, Wmax - m)

            def fetch(j, acc):
                w0a, w1a = acc
                tile = words_ref[jnp.minimum(m + j, Wmax - 1)]
                w0a = jnp.where(wi == m + j, tile, w0a)
                w1a = jnp.where(wi + 1 == m + j, tile, w1a)
                return w0a, w1a

            zero = jnp.zeros_like(wi, dtype=jnp.uint32)
            w0, w1 = jax.lax.fori_loop(0, span, fetch, (zero, zero))

            b = bi.astype(jnp.uint32)
            win = jnp.where(bi == 0, w0,
                            (w0 << b) | (w1 >> (jnp.uint32(WORD_BITS) - b)))
            idx = (win >> jnp.uint32(WORD_BITS - lut_bits)).astype(jnp.int32)

            st_row = starts_ref[i].reshape(1, 1, K)
            dl_row = deltas_ref[i].reshape(1, 1, K)
            cmp = idx[:, :, None] >= st_row
            entry = jnp.sum(jnp.where(cmp, dl_row, 0), axis=2)

            valid = (k * Tc + i) < totals
            sym = entry & 0x1FF
            l = jnp.where(valid, entry >> 9, 0)
            out_ref[i] = sym
            b2 = bi + l
            wi_ref[:] = wi + (b2 >> 5)
            bi_ref[:] = b2 & 31
            return 0

        jax.lax.fori_loop(0, Tc, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_steps", "shared_luts",
                                             "lut_bits", "interpret"))
def unpack_substreams_uniform_pallas(
        words_dense: jnp.ndarray, step_starts: jnp.ndarray,
        step_deltas: jnp.ndarray, totals: jnp.ndarray, n_steps: int = 0,
        shared_luts: bool = False, lut_bits: int = 12,
        interpret: bool = False) -> jnp.ndarray:
    """Pallas LUT walk over dense per-lane word planes.

    words_dense (Wmax, Sp) uint32 — substream s's words in column s (host
                 lays these out; Sp a multiple of 128, zero-padded)
    step_starts/step_deltas (T, 256) int32 — each step's decode table as
                 canonical LUT runs (lut_runs_device); with shared_luts=True
                 a single (Tc, 256) broadcast block reused by every grid
                 step (constant tree; pass the real step count via n_steps)
    totals      (Sp,) int32 — symbols in substream s (validity boundary)
    Returns (S_p, T) int32 symbols; bit-identical to unpack_substreams for
    the same streams (tests/test_lookup.py walk cases).
    """
    Wmax, Sp = words_dense.shape
    T = n_steps or step_starts.shape[0]
    K = step_starts.shape[1]
    assert Sp % 128 == 0, "pad substream lanes to a multiple of 128"
    Sr = Sp // 128
    # shared tables set the step tile: every grid block reuses the SAME
    # (Tc, K) LUT block, so a caller with periodic trees (period Lt) passes
    # tables tiled to Tc = k*Lt and steps stay tree-aligned across blocks
    # (long reads: (T, 256) per-step tables would not fit — WALK_PER_STEP_MAX)
    Tc = step_starts.shape[0] if shared_luts else _WALK_TC
    Tp = -(-T // Tc) * Tc
    if not shared_luts and Tp != T:
        step_starts = jnp.pad(step_starts, ((0, Tp - T), (0, 0)))
        step_deltas = jnp.pad(step_deltas, ((0, Tp - T), (0, 0)))
    grid = (Tp // Tc,)
    words3 = words_dense.reshape(Wmax, Sr, 128)
    totals2 = totals.reshape(Sr, 128)
    lut_map = (lambda k: (0, 0)) if shared_luts else (lambda k: (k, 0))
    out = pl.pallas_call(
        _make_walk_kernel(lut_bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Wmax, Sr, 128), lambda k: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, K), lut_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, K), lut_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sr, 128), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tc, Sr, 128), lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Sr, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Sr, 128), jnp.int32),
            pltpu.VMEM((Sr, 128), jnp.int32),
        ],
        interpret=interpret,
    )(words3, step_starts, step_deltas, totals2)
    return out.reshape(Tp, Sp).T[:, :T]


def _make_masked_kernel(plain2: bool, lut_bits: int):
    """Masked walk kernel: step t is an OUTPUT SLOT, not a symbol index —
    the lane consumes its next symbol only where mask[t] is set (and emits
    0 elsewhere). Decoded symbols therefore land directly in slot order:
    with slots (g, p) this produces the (R, L) layout with NO
    scatter/gather — the per-element general gather XLA would need costs
    ~16 ns/elem (measured 37.9 ms for the 2.36M-element plain-DNA
    extraction). Tables arrive as canonical LUT runs (see
    _make_walk_kernel). plain2: all codes are 2-bit values (plain DNA) —
    the entry is arithmetic, no table at all."""

    def kernel(words_ref, starts_ref, deltas_ref, mask_ref, live_ref,
               out_ref, wi_ref, bi_ref):
        k = pl.program_id(0)
        Tc = out_ref.shape[0]
        Wmax = words_ref.shape[0]
        K = starts_ref.shape[1]

        @pl.when(k == 0)
        def _():
            wi_ref[:] = jnp.zeros_like(wi_ref)
            bi_ref[:] = jnp.zeros_like(bi_ref)

        # see _make_walk_kernel: dead lanes (no slot ever set — bucket
        # padding) must not pin the fetch band's min at word 0
        live = live_ref[:] != 0

        def step(i, _):
            wi = wi_ref[:]
            bi = bi_ref[:]
            m = jnp.min(jnp.where(live, wi, jnp.int32(1) << 30))
            mx = jnp.max(jnp.where(live, wi, -1))
            span = jnp.minimum(mx + 2 - m, Wmax - m)

            def fetch(j, acc):
                w0a, w1a = acc
                tile = words_ref[jnp.minimum(m + j, Wmax - 1)]
                w0a = jnp.where(wi == m + j, tile, w0a)
                w1a = jnp.where(wi + 1 == m + j, tile, w1a)
                return w0a, w1a

            zero = jnp.zeros_like(wi, dtype=jnp.uint32)
            w0, w1 = jax.lax.fori_loop(0, span, fetch, (zero, zero))

            b = bi.astype(jnp.uint32)
            win = jnp.where(bi == 0, w0,
                            (w0 << b) | (w1 >> (jnp.uint32(WORD_BITS) - b)))
            if plain2:
                entry = (jnp.int32(2) << 9) | (win >> 30).astype(jnp.int32)
            else:
                idx = (win >> jnp.uint32(WORD_BITS - lut_bits)
                       ).astype(jnp.int32)
                st_row = starts_ref[i].reshape(1, 1, K)
                dl_row = deltas_ref[i].reshape(1, 1, K)
                cmp = idx[:, :, None] >= st_row
                entry = jnp.sum(jnp.where(cmp, dl_row, 0), axis=2)

            consume = mask_ref[i] != 0
            out_ref[i] = jnp.where(consume, entry & 0x1FF, 0)
            l = jnp.where(consume, entry >> 9, 0)
            b2 = bi + l
            wi_ref[:] = wi + (b2 >> 5)
            bi_ref[:] = b2 & 31
            return 0

        jax.lax.fori_loop(0, Tc, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "n_steps", "shared_luts", "plain2", "lut_bits", "interpret"))
def unpack_substreams_masked_pallas(
        words_dense: jnp.ndarray, step_starts: jnp.ndarray,
        step_deltas: jnp.ndarray, mask: jnp.ndarray, n_steps: int = 0,
        shared_luts: bool = False, plain2: bool = False, lut_bits: int = 12,
        interpret: bool = False) -> jnp.ndarray:
    """Masked pallas walk: mask (T, Sp) uint8/bool — slot (t, s) consumes
    the lane's next symbol iff set; unset slots emit 0 and do not advance.
    Otherwise identical to unpack_substreams_uniform_pallas (tables as
    canonical LUT runs). plain2 decodes fixed 2-bit codes with no table.
    Returns (Sp, T) int32 in slot order."""
    Wmax, Sp = words_dense.shape
    T = n_steps or step_starts.shape[0]
    K = step_starts.shape[1]
    assert Sp % 128 == 0, "pad substream lanes to a multiple of 128"
    Sr = Sp // 128
    # see unpack_substreams_uniform_pallas: shared tables set the step tile
    Tc = step_starts.shape[0] if shared_luts else _WALK_TC
    Tp = -(-T // Tc) * Tc
    if not shared_luts and Tp != step_starts.shape[0]:
        pad = Tp - step_starts.shape[0]
        step_starts = jnp.pad(step_starts, ((0, pad), (0, 0)))
        step_deltas = jnp.pad(step_deltas, ((0, pad), (0, 0)))
    if Tp != T:
        mask = jnp.pad(mask.astype(jnp.uint8), ((0, Tp - T), (0, 0)))
    grid = (Tp // Tc,)
    words3 = words_dense.reshape(Wmax, Sr, 128)
    mask3 = mask.astype(jnp.uint8).reshape(Tp, Sr, 128)
    # lanes with no slot ever set are bucket padding; the kernel excludes
    # them from the fetch band (see _make_walk_kernel's dead-lane note)
    live3 = (mask3 != 0).any(axis=0).astype(jnp.int32)
    lut_map = (lambda k: (0, 0)) if shared_luts else (lambda k: (k, 0))
    out = pl.pallas_call(
        _make_masked_kernel(plain2, lut_bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Wmax, Sr, 128), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, K), lut_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, K), lut_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, Sr, 128), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sr, 128), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tc, Sr, 128), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Sr, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Sr, 128), jnp.int32),
            pltpu.VMEM((Sr, 128), jnp.int32),
        ],
        interpret=interpret,
    )(words3, step_starts, step_deltas, mask3, live3)
    return out.reshape(Tp, Sp).T[:, :T]


@functools.partial(jax.jit, static_argnames=("Wmax", "Sp"))
def dense_words_device(words: jnp.ndarray, sub_n_words: jnp.ndarray,
                       Wmax: int, Sp: int) -> jnp.ndarray:
    """Device twin of dense_words_np: linear packed words (~the compressed
    payload) → the (Wmax, Sp) per-lane plane the pallas walk consumes —
    so the host uploads the LINEAR stream instead of the padded plane
    (measured 1.8-2.3x the real words; the wire is the decode bottleneck
    on PCIe/relay links, tasks.cpp:957-1101 is the decode side replaced).

    Built with two stable sorts (XLA:TPU serializes gather/scatter; sort is
    the fast data-movement primitive — same rationale as pack_bits_rows /
    compact_rows). In lane-major slot order the valid slots' source indices
    are exactly 0..total-1 (start = exclusive prefix sum of sub_n_words), so
    sort #1 of (source_key, slot_id) yields slot ids in source order, and
    sort #2 of (slot_id, words padded to the plane) lands every word at its
    slot; invalid slots receive the zero padding (their keys sort past
    `total`, stably in slot order, exactly facing the zero tail)."""
    S = sub_n_words.shape[0]
    sub = jnp.zeros((Sp,), jnp.int32)
    sub = jax.lax.dynamic_update_slice(sub, sub_n_words.astype(jnp.int32), (0,))
    start = jnp.cumsum(sub) - sub
    col = jnp.arange(Wmax, dtype=jnp.int32)[None, :]
    valid = col < sub[:, None]
    key = jnp.where(valid, start[:, None] + col,
                    jnp.int32(0x7FFFFFFF)).reshape(-1)
    n = Sp * Wmax
    slot = jnp.arange(n, dtype=jnp.int32)
    _, sid = jax.lax.sort((key, slot), dimension=0, num_keys=1, is_stable=True)
    w = words.astype(jnp.uint32)
    if w.shape[0] < n:
        w = jnp.concatenate([w, jnp.zeros(n - w.shape[0], jnp.uint32)])
    else:
        # words beyond `total` are upload-pad zeros; the plane holds >= total
        # words by construction (Wmax >= max(sub) per lane), so this drops
        # only zeros
        w = w[:n]
    _, vals = jax.lax.sort((sid, w), dimension=0, num_keys=1, is_stable=True)
    return vals.reshape(Sp, Wmax).T


#: rows per grid step of the densify copy kernel (DMAs per batch overlap)
_DENSE_RB = 8


def _dense_rows_kernel(start_ref, w_ref, out_ref, sems):
    """Row s of out gets words[start[s] : start[s]+Wmax] by one HBM→HBM DMA.

    Rows own disjoint output regions, so the _DENSE_RB DMAs of a batch are
    issued back-to-back and drained together — no ordering constraints. A
    row's tail beyond sub[s] words holds the *following* lanes' words
    rather than zeros; that is safe for the walk kernels: per-lane cursors
    never pass the lane's own bit total, and trailing don't-care bits in a
    LUT window hit entries that share the code prefix (full-width canonical
    LUT), so decoded symbols are unaffected."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    Wmax = out_ref.shape[1]

    def _dma(j):
        s = i * _DENSE_RB + j
        return pltpu.make_async_copy(
            w_ref.at[pl.ds(start_ref[s], Wmax)], out_ref.at[s], sems.at[j])

    def _issue(j, c):
        _dma(j).start()
        return c

    def _drain(j, c):
        _dma(j).wait()
        return c

    jax.lax.fori_loop(0, _DENSE_RB, _issue, 0)
    jax.lax.fori_loop(0, _DENSE_RB, _drain, 0)


@functools.partial(jax.jit, static_argnames=("Wmax", "Sp", "interpret"))
def dense_words_pallas(words: jnp.ndarray, sub_n_words: jnp.ndarray,
                       Wmax: int, Sp: int, interpret: bool = False):
    """Pallas twin of dense_words_device: one contiguous DMA per lane
    instead of two global sorts (ROADMAP #4 — BENCH_r03 showed the sorts
    dominating the fused decode graph). Valid cells (w < sub[s]) match
    dense_words_device exactly; padding cells hold neighboring words, not
    zeros (safe for the walks, see _dense_rows_kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sub = jnp.zeros((Sp,), jnp.int32)
    sub = jax.lax.dynamic_update_slice(sub, sub_n_words.astype(jnp.int32), (0,))
    start = jnp.cumsum(sub) - sub
    # over-read room for the last lanes: start[s] + Wmax <= n + Wmax
    w = jnp.concatenate([words.astype(jnp.uint32),
                         jnp.zeros(Wmax, jnp.uint32)])
    # both buffers pinned to HBM: untiled memrefs take DMA slices at
    # arbitrary word offsets, where ANY lets Mosaic promote the source to
    # VMEM whose (1024,) tiling rejects the unaligned pl.ds slices
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Sp // _DENSE_RB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_DENSE_RB,))],
    )
    out = pl.pallas_call(
        _dense_rows_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Sp, Wmax), jnp.uint32),
        interpret=interpret)(start, w)
    return out.T


def dense_words(words: jnp.ndarray, sub_n_words: jnp.ndarray,
                Wmax: int, Sp: int, interpret: bool = False):
    """Strategy-selected densify over a LINEAR substream-sequential word
    stream (see module constant DENSIFY; the module-level resolve makes the
    choice explicit and import-time-stable). Both strategies produce
    walk-equivalent planes: identical valid cells; the DMA kernel's padding
    cells hold neighboring words, which the walk kernels never consume —
    see _dense_rows_kernel. The banded wire layout (dense_words_banded)
    supersedes both on the fused decode path."""
    if DENSIFY == "dma":
        return dense_words_pallas(words, sub_n_words, Wmax, Sp,
                                  interpret=interpret)
    return dense_words_device(words, sub_n_words, Wmax, Sp)


def banded_words_np(words: np.ndarray, sub_n_words: np.ndarray,
                    group: int = DENSE_GROUP) -> np.ndarray:
    """Host restructure: linear substream-sequential words → the group-banded
    wire layout (the container stays linear, so the RATIO is untouched; only
    the upload image changes — VERDICT r3 next #1 realized on the wire
    instead of in the format).

    Substreams are grouped `group` at a time; group g's block stores its
    lanes' words band-major — word w of lane j at block offset w*group + j —
    padded with zeros to the group's max word count Wg. The device plane
    build (dense_words_banded) is then one contiguous (Wmax, group) slice
    per group: zero data-dependent movement.

    words must hold at least sum(sub_n_words) leading real words (trailing
    slack is ignored)."""
    sub = np.asarray(sub_n_words).astype(np.int64)
    S = sub.shape[0]
    if S == 0:
        return np.zeros(0, np.uint32)
    ng = -(-S // group)
    subp = np.pad(sub, (0, ng * group - S))
    Wg = subp.reshape(ng, group).max(axis=1)
    gw = Wg * group
    gstart = np.concatenate([[0], np.cumsum(gw)[:-1]])
    out = np.zeros(int(gw.sum()), np.uint32)
    Wmax = int(subp.max())
    if Wmax == 0:
        return out
    cols = np.arange(Wmax, dtype=np.int64)
    m = cols[None, :] < subp[:, None]                      # (S', Wmax)
    lane = np.arange(ng * group, dtype=np.int64)
    dst = (np.repeat(gstart, group)[:, None] + cols[None, :] * group
           + (lane % group)[:, None])[m]
    # row-major selection order of m == (lane, word) == the linear layout's
    # substream-sequential source order
    out[dst] = np.asarray(words, np.uint32)[: int(sub.sum())]
    return out


@functools.partial(jax.jit, static_argnames=("Wmax", "Sp", "group"))
def dense_words_banded(blob: jnp.ndarray, words_off: jnp.ndarray,
                       sub_n_words: jnp.ndarray, Wmax: int, Sp: int,
                       group: int = DENSE_GROUP) -> jnp.ndarray:
    """Device plane build over the banded wire layout (banded_words_np):
    each group's block is already a contiguous (Wg, group) slab, so the
    (Wmax, Sp) walk plane is Sp/group dynamic slices + updates — no sorts,
    no gathers (the primitives XLA:TPU serializes).

    blob[words_off:] holds the banded words; words_off may be traced (the
    DNA stream's offset is the quality stream's dynamic banded total).
    Rows >= the group max hold the NEXT group's words rather than zeros —
    safe for the walk kernels: per-lane cursors never pass the lane's own
    bit total, and trailing don't-care bits in a LUT window hit entries
    sharing the code prefix (full-width canonical LUT). The caller
    guarantees blob extends >= Wmax*group words past the last group start
    (the wire builder appends that slack)."""
    assert Sp % group == 0
    sub = jnp.zeros((Sp,), jnp.int32)
    sub = jax.lax.dynamic_update_slice(
        sub, sub_n_words.astype(jnp.int32), (0,))
    ng = Sp // group
    Wg = jnp.max(sub.reshape(ng, group), axis=1)           # (ng,)
    gw = Wg * group
    gstart = words_off.astype(jnp.int32) + jnp.cumsum(gw) - gw

    def body(g, plane):
        chunk = jax.lax.dynamic_slice(blob, (gstart[g],), (Wmax * group,))
        return jax.lax.dynamic_update_slice(
            plane, chunk.reshape(Wmax, group), (0, g * group))

    return jax.lax.fori_loop(0, ng, body,
                             jnp.zeros((Wmax, Sp), jnp.uint32))


def banded_total(sub_n_words: jnp.ndarray, Sp: int,
                 group: int = DENSE_GROUP) -> jnp.ndarray:
    """Device twin of len(banded_words_np(...)): total words of the banded
    image, computed from the substream table (pad groups beyond the real
    lanes contribute zero, so any Sp >= ceil(S/group)*group agrees with the
    host)."""
    sub = jnp.zeros((Sp,), jnp.int32)
    sub = jax.lax.dynamic_update_slice(
        sub, sub_n_words.astype(jnp.int32), (0,))
    Wg = jnp.max(sub.reshape(Sp // group, group), axis=1)
    return jnp.sum(Wg) * group


def dense_geometry(sub_n_words: np.ndarray, row_bucket: int = 256,
                   lane_pad: int = 128) -> tuple:
    """(Wmax, Sp) plane geometry for the pallas walk, bucketed so sub-blocks
    share compiled executables."""
    sub = np.asarray(sub_n_words)
    S = sub.shape[0]
    Sp = max(lane_pad, -(-S // lane_pad) * lane_pad)
    Wmax = max(int(sub.max()) if S else 0, 1)
    Wmax = -(-Wmax // row_bucket) * row_bucket
    return Wmax, Sp


def slot_mask(valid: jnp.ndarray, G: int, Sp: int) -> jnp.ndarray:
    """(R, L) per-cell validity → (T, Sp) slot mask for the masked walk:
    slot t = g*L + p of lane s consumes a symbol iff valid[s*G+g, p]."""
    R, L = valid.shape
    S = R // G
    m = valid.reshape(S, G * L).T.astype(jnp.uint8)     # (T, S)
    return jnp.pad(m, ((0, 0), (0, Sp - S)))


def pack_lens4_np(lens2d: np.ndarray, singletons: np.ndarray) -> np.ndarray:
    """Decode-table wire form: (T, 256) code lengths as packed 4-bit
    nibbles (MSB-first) + per-tree singleton symbols — T*33 uint32 words,
    ~8x smaller than run words and ~120x smaller than the int16 planes.
    luts_from_lens_device is the exact device inverse (the planes are a
    pure function of canonical lengths)."""
    lens = np.asarray(lens2d, np.uint32)
    T = lens.shape[0]
    assert lens.shape[1] == 256, \
        "lens4 wire form requires 256-symbol alphabets"
    if not (lens < 16).all():
        # guards untrusted container data (load_table admits nibble+1 = 16),
        # so this must survive python -O and raise per the ValueError contract
        raise ValueError("corrupt table: code length >= 16")
    nib = lens.reshape(T, 32, 8)
    shifts = (28 - 4 * np.arange(8, dtype=np.uint32))
    words = (nib << shifts[None, None, :]).sum(axis=2, dtype=np.uint32)
    singles = np.asarray(singletons, np.int32).view(np.uint32)
    return np.concatenate([words.reshape(-1), singles])


@functools.partial(jax.jit, static_argnames=("T", "V"))
def lut_runs_device(lens_words: jnp.ndarray, singles: jnp.ndarray,
                    T: int, V: int):
    """Nibble-packed canonical code lengths → per-tree LUT RUNS:
    (starts (T, 256) int32, deltas (T, 256) int32) in canonical order.

    Canonical codes left-align at the running Kraft sum of their (len, sym)
    predecessors, so symbol i's full-width LUT run starts exactly at that
    prefix and the plane value at window w is Σ deltas over runs with
    start <= w (the cumulative-delta identity). The walk kernels evaluate
    that sum directly with 256 compare columns instead of selecting from a
    2^lut_bits plane — 16x less VPU work per step at the 12-bit width.
    Absent symbols share start = the Kraft end (= V for complete codes, so
    they never match a window; an incomplete corrupt table zero-fills its
    tail via the first absent slot's negative delta, exactly like
    decode_lut's unused windows). Zero-bit singleton trees become one
    all-covering run carrying the symbol."""
    B = (V - 1).bit_length()
    w = lens_words.reshape(T, 32)
    sh = (28 - 4 * jnp.arange(8, dtype=jnp.uint32))
    lens = ((w[:, :, None] >> sh[None, None, :]) & 0xF).reshape(
        T, 256).astype(jnp.int32)
    sym = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32)[None, :],
                           (T, 256))
    present = lens > 0
    key = jnp.where(present, lens * 512 + sym, jnp.int32(1) << 20)
    _, ssym, slens = jax.lax.sort((key, sym, lens), dimension=1, num_keys=1)
    wk = jnp.where(slens > 0,
                   jnp.int32(1) << (B - jnp.minimum(slens, B)), 0)
    start = jnp.cumsum(wk, axis=1) - wk            # = code << (B - len)
    entry = jnp.where(slens > 0, (slens << 9) | ssym, 0)
    prev = jnp.concatenate([jnp.zeros((T, 1), jnp.int32), entry[:, :-1]],
                           axis=1)
    deltas = entry - prev
    singles = singles.astype(jnp.int32)
    single_row = singles[:, None] >= 0
    col0 = jnp.arange(256, dtype=jnp.int32)[None, :] == 0
    start = jnp.where(single_row, jnp.where(col0, 0, V), start)
    deltas = jnp.where(single_row,
                       jnp.where(col0, singles[:, None], 0), deltas)
    return start, deltas


@functools.partial(jax.jit, static_argnames=("T", "V"))
def luts_from_lens_device(lens_words: jnp.ndarray, singles: jnp.ndarray,
                          T: int, V: int) -> jnp.ndarray:
    """Device inverse of pack_lens4_np: nibble-packed canonical code
    lengths → (T, V) int32 packed (len << 9 | sym) decode planes,
    bit-identical to huffman.decode_lut_batch (the expanded form of
    lut_runs_device, used by the non-pallas decode paths and as the
    semantic reference in tests)."""
    start, deltas = lut_runs_device(lens_words, singles, T, V)
    rows = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                            (T, 256))
    grid = jnp.zeros((T, V), jnp.int32).at[
        rows, jnp.minimum(start, V)].add(deltas, mode="drop")
    return jnp.cumsum(grid, axis=1)


def dense_words_np(words: np.ndarray, sub_n_words: np.ndarray,
                   lane_pad: int = 128) -> np.ndarray:
    """Host layout for the pallas walk: linear packed words → (Wmax, Sp)
    with substream s's words down column s (columns past sub_n_words[s]
    and lane-padding columns are zero)."""
    sub = np.asarray(sub_n_words).astype(np.int64)
    S = sub.shape[0]
    Sp = max(lane_pad, -(-S // lane_pad) * lane_pad)
    # word rows bucketed so sub-blocks share compiled walk executables
    Wmax = max(int(sub.max()) if S else 0, 1)
    Wmax = -(-Wmax // 256) * 256
    start = np.concatenate([[0], np.cumsum(sub)[:-1]])
    words = np.asarray(words, np.uint32)
    cols = np.arange(Wmax, dtype=np.int64)
    idx = start[:, None] + cols[None, :]
    m = cols[None, :] < sub[:, None]
    dense = np.zeros((Sp, Wmax), np.uint32)
    dense[:S] = np.where(m, words[np.minimum(idx, max(words.shape[0] - 1, 0))], 0)
    return np.ascontiguousarray(dense.T)


@functools.partial(jax.jit, static_argnames=("n_out",))
def extract_fixed_width(words: jnp.ndarray, bit_offsets: jnp.ndarray,
                        widths: jnp.ndarray, n_out: int):
    """Fully parallel extraction of fixed/known-width fields.

    When symbol widths are known up front (2-bit DNA, fixed-width numeric
    fields), decode needs no sequential walk at all: every symbol's bit offset
    comes from a prefix sum over the known widths and extraction is one
    two-word gather per symbol. widths must be <= 16.
    """
    del n_out
    o = bit_offsets.astype(jnp.int32)
    w = o // WORD_BITS
    b = (o % WORD_BITS).astype(jnp.uint32)
    words = jnp.concatenate([words, jnp.zeros(2, jnp.uint32)])
    n_words = words.shape[0]
    w1 = words[jnp.clip(w, 0, n_words - 1)]
    w2 = words[jnp.clip(w + 1, 0, n_words - 1)]
    win = jnp.where(b == 0, w1, (w1 << b) | (w2 >> (jnp.uint32(WORD_BITS) - b)))
    width = widths.astype(jnp.uint32)
    shifted = win >> (jnp.uint32(WORD_BITS) - jnp.maximum(width, 1))
    return jnp.where(width == 0, 0, shifted & ((jnp.uint32(1) << width) - 1)).astype(jnp.uint32)
