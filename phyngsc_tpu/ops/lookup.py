"""Table lookups as one-hot MXU matmuls.

XLA's general gather is the slowest primitive on TPU (measured 52.8 ms for a
2.36M-element gather from a (36,256) table vs 5.9 ms as a matmul — the MXU is
the machine's only fast "indexed read"). A per-position code-table lookup
out[r,p] = tab[p, sym[r,p]] is exactly a batched one-hot contraction:

    out[c, p] = Σ_s onehot(sym[c,p])[s] · tab[p, s]

One-hot rows are 0/1 (exact in bfloat16) and each row selects a single
element, so the f32 accumulation is exact as long as each table plane fits
the mantissa; tables are split into 8-bit planes to guarantee it. Chunked
over records so the one-hot tile stays in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: fused entry layout: (len << CODE_BITS) | code
CODE_BITS = 12


def group_for(max_len: int) -> int:
    """Grouping factor for group_codes: the largest k with
    k * max_len <= 32, clamped to [2, 8]."""
    return max(2, min(32 // max(max_len, 1), 8))


def fuse_tables(codes, lens):
    """(T, A) uint32 codes + (T, A) uint8 lens → (T, A) int32 fused entries.
    Requires code < 2**CODE_BITS (i.e. max_code_len <= 12)."""
    return (lens.astype(jnp.int32) << CODE_BITS) | codes.astype(jnp.int32)


def window_np(counts) -> tuple:
    """Alphabet window (off, A) for a (..., 256) symbol-count array.

    The one-hot lookup's cost is linear in table columns; real alphabets
    occupy a narrow byte range (quality ~[33, 104], DNA letters ~[45, 89]),
    so the encoder slices its tables to A ∈ {64, 128, 256} columns starting
    at `off` and looks up clip(sym - off, 0, A-1). Safe whenever every
    symbol that can occur at an unmasked position has a nonzero count
    (callers mask invalid positions after the lookup, exactly as they
    already do at full width). A is bucketed so executables don't
    proliferate per dataset."""
    import numpy as np

    c = np.asarray(counts).reshape(-1, counts.shape[-1])
    nz = np.flatnonzero(c.any(axis=0))
    if nz.size == 0:
        return 0, 64
    width = int(nz[-1]) - int(nz[0]) + 1
    for A in (64, 128, 256):
        if width <= A:
            return min(int(nz[0]), c.shape[1] - A), A
    raise AssertionError("symbol alphabet exceeds 256")


def _resolve_variant() -> str:
    import os

    return os.environ.get("PHYNGSC_LOOKUP", "auto")


#: Kernel variant for the TPU path, resolved ONCE at import (fused_lookup is
#: traced inside larger jits, so a later env change could never reach
#: already-compiled shapes anyway — resolving at import makes the semantics
#: explicit; A/B experiments must set PHYNGSC_LOOKUP before importing, or
#: assign lookup.VARIANT before the first trace):
#:
#: - "auto" (default): f32 — ONE one-hot dot (fused entries < 2^16, exact
#:   in f32 well below its 2^24 integer range). Measured r4 on v5e at
#:   (65536, 36): A=64 f32 0.204 ms vs bf16x2 0.541 vs int8 0.390;
#:   A=256 f32 3.3 ms ~ pallas 3.1. Also the current Mosaic toolchain
#:   REJECTS the pallas kernel at A=64 (remote-compile 500; it still
#:   builds at A=256), so auto must not route through it.
#: - "bf16x2": batched one-hot, two bf16 dots (lo/hi 8-bit planes)
#: - "f32":    batched one-hot, ONE f32 dot
#: - "int8":   batched one-hot, ONE int8 dot, 3 planes (6/6/4 bits)
#: - "flat":   flat (R*L, A) @ (A, 2L) bf16 dot — proper MXU N-dim — then a
#:             fused diagonal mask-reduce picks column p for row (r, p)
#: - "pallas": VMEM-resident one-hot int8 kernel (fused_lookup_pallas below;
#:   opt-in only while Mosaic rejects A=64)
#: All variants are bit-exact (verified in tests against the gather path).
VARIANT = _resolve_variant()


@functools.partial(jax.jit, static_argnames=("chunk",))
def fused_lookup(symbols: jnp.ndarray, fused_tab: jnp.ndarray,
                 chunk: int = 4096) -> jnp.ndarray:
    """symbols (R, L) uint8/int32, fused_tab (L, A) int32 (one row per
    position; caller clamps tree indices) → fused entries (R, L) int32.

    The one-hot matmul only pays off where gathers are slow (TPU); other
    backends take the direct gather (trace-time branch — jit compiles per
    backend)."""
    R, L = symbols.shape
    A = fused_tab.shape[1]
    if jax.default_backend() != "tpu":
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        return fused_tab[pos, symbols.astype(jnp.int32)]
    variant = VARIANT
    if variant == "auto":
        variant = "f32"

    if variant == "pallas":
        return fused_lookup_pallas(symbols, fused_tab)

    pad = (-R) % chunk
    sym = jnp.pad(symbols.astype(jnp.int32), ((0, pad), (0, 0)))
    ids = jnp.arange(A, dtype=jnp.int32)

    if variant == "flat":
        lo = (fused_tab & 0xFF).astype(jnp.bfloat16)
        hi = ((fused_tab >> 8) & 0xFF).astype(jnp.bfloat16)
        tab2 = jnp.concatenate([lo, hi], axis=0).T      # (A, 2L)
        eye = (jnp.arange(L, dtype=jnp.int32)[:, None]
               == jnp.arange(L, dtype=jnp.int32)[None, :]).astype(jnp.float32)

        def step(carry, s_ch):
            ch = s_ch.shape[0]
            oh = (s_ch.reshape(ch * L, 1) == ids[None, :]).astype(jnp.bfloat16)
            full = jax.lax.dot_general(
                oh, tab2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(ch, L, 2 * L)
            vlo = jnp.sum(full[..., :L] * eye[None], axis=-1)
            vhi = jnp.sum(full[..., L:] * eye[None], axis=-1)
            return carry, vlo.astype(jnp.int32) | (vhi.astype(jnp.int32) << 8)

        n_ch = sym.shape[0] // chunk
        _, fused = jax.lax.scan(step, 0, sym.reshape(n_ch, chunk, L))
        return fused.reshape(-1, L)[:R]

    if variant == "f32":
        tab = fused_tab.astype(jnp.float32)  # entries < 2^16: exact

        def step(carry, s_ch):
            oh = (s_ch[:, :, None] == ids[None, None, :]).astype(jnp.float32)
            v = jax.lax.dot_general(
                oh, tab, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.float32)
            return carry, v.astype(jnp.int32)

    elif variant == "int8":
        p0 = (fused_tab & 0x3F).astype(jnp.int8)
        p1 = ((fused_tab >> 6) & 0x3F).astype(jnp.int8)
        p2 = ((fused_tab >> 12) & 0x0F).astype(jnp.int8)
        tab3 = jnp.stack([p0, p1, p2], axis=-1)          # (L, A, 3)

        def step(carry, s_ch):
            oh = (s_ch[:, :, None] == ids[None, None, :]).astype(jnp.int8)
            v = jax.lax.dot_general(
                oh, tab3, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32)
            return carry, v[..., 0] | (v[..., 1] << 6) | (v[..., 2] << 12)

    else:  # bf16x2
        lo = (fused_tab & 0xFF).astype(jnp.bfloat16)
        hi = ((fused_tab >> 8) & 0xFFFF).astype(jnp.bfloat16)  # < 2^9

        def step(carry, s_ch):  # s_ch (chunk, L)
            oh = (s_ch[:, :, None] == ids[None, None, :]).astype(jnp.bfloat16)
            # batch dim: position (axis 1 of oh / axis 0 of tab)
            vlo = jax.lax.dot_general(
                oh, lo, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.float32)
            vhi = jax.lax.dot_general(
                oh, hi, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.float32)
            return carry, (vhi.astype(jnp.int32) << 8) | vlo.astype(jnp.int32)

    n_ch = sym.shape[0] // chunk
    _, fused = jax.lax.scan(step, 0, sym.reshape(n_ch, chunk, L))
    # scan output is (n_ch, L, chunk) — batch dim leads after dot_general
    return fused.transpose(0, 2, 1).reshape(-1, L)[:R]


def split_fused(fused: jnp.ndarray):
    """fused entries → (codes uint32, lens int32)."""
    return ((fused & ((1 << CODE_BITS) - 1)).astype(jnp.uint32),
            (fused >> CODE_BITS).astype(jnp.int32))


# ---------------------------------------------------------------------------
# Pallas variant: one-hot stays in VMEM.
#
# The XLA variants above materialize the (chunk, L, A) one-hot in HBM (~84 MB
# per 4096-record chunk at L=36) because XLA does not fuse producers into
# matmul operands — the measured ~5 ms is that HBM round trip, not FLOPs.
# This kernel builds the one-hot tile in VMEM and contracts it there with a
# block-diagonal 3-plane int8 table, so HBM traffic is just symbols in +
# entries out. Per record tile of TR rows and a position chunk of Lc
# positions:
#
#     oh[r, p*A+s] = (sym[r,p] == s)                      (TR, Lc*A) int8
#     T[p*A+s, j]  = plane_k[p, s] for j == k*Lc + p      (Lc*A, C)  int8
#     acc = oh @ T                                        (TR, C)   int32
#     out[r,p] = acc[r,p] | acc[r,Lc+p]<<6 | acc[r,2Lc+p]<<12
#
# The 16-bit fused entry rides in 3 MXU-native int8 planes (6/6/4 bits);
# columns [k*Lc + p] give the result directly — no diagonal mask-reduce.
# C = pad128(3*Lc) so position chunks of <= 42 keep C = 128.
# ---------------------------------------------------------------------------

#: record-tile rows and max positions per pallas call (3*42 <= 128 lanes)
_PL_TR = 256
_PL_LC = 40


def _pl_kernel(sym_ref, tab_ref, out_ref):
    TR, Lc = sym_ref.shape
    A = tab_ref.shape[0] // Lc
    s = sym_ref[:]
    oh = (s[:, :, None]
          == jax.lax.broadcasted_iota(jnp.int32, (TR, Lc, A), 2))
    acc = jax.lax.dot_general(
        oh.astype(jnp.int8).reshape(TR, Lc * A), tab_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out_ref[:] = (acc[:, :Lc] | (acc[:, Lc : 2 * Lc] << 6)
                  | (acc[:, 2 * Lc : 3 * Lc] << 12))


def _pl_chunk(sym: jnp.ndarray, tab: jnp.ndarray, interpret: bool):
    """One (Rp, Lc) position chunk; Rp % _PL_TR == 0, Lc <= _PL_LC."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Rp, Lc = sym.shape
    A = tab.shape[1]
    C = -(-3 * Lc // 128) * 128
    t = tab.astype(jnp.int32)
    planes = [t & 0x3F, (t >> 6) & 0x3F, (t >> 12) & 0x0F]   # (Lc, A) each
    jj = jax.lax.broadcasted_iota(jnp.int32, (Lc, A, C), 2)
    pp = jax.lax.broadcasted_iota(jnp.int32, (Lc, A, C), 0)
    T3 = jnp.zeros((Lc, A, C), jnp.int8)
    for k, pk in enumerate(planes):
        T3 = jnp.where(jj == k * Lc + pp, pk[:, :, None].astype(jnp.int8), T3)
    return pl.pallas_call(
        _pl_kernel,
        grid=(Rp // _PL_TR,),
        in_specs=[
            pl.BlockSpec((_PL_TR, Lc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc * A, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_PL_TR, Lc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Lc), jnp.int32),
        interpret=interpret,
    )(sym, T3.reshape(Lc * A, C))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_lookup_pallas(symbols: jnp.ndarray, fused_tab: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas twin of fused_lookup — bit-exact (tests/test_bitpack.py)."""
    R, L = symbols.shape
    if fused_tab.shape[1] not in (64, 128, 256):
        raise ValueError("fused_lookup_pallas requires A in {64, 128, 256}")
    pad = (-R) % _PL_TR
    sym = jnp.pad(symbols.astype(jnp.int32), ((0, pad), (0, 0)))
    outs = []
    for c0 in range(0, L, _PL_LC):
        c1 = min(c0 + _PL_LC, L)
        outs.append(_pl_chunk(sym[:, c0:c1], fused_tab[c0:c1], interpret))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out[:R]


# ---------------------------------------------------------------------------
# Symbol pairing: halve the scatter count by emitting two codes per element.
# Bit layout is unchanged (first symbol occupies the higher bits), so decode
# is unaffected. Requires combined length <= 32 and combined code < 2^32:
# guaranteed for max_code_len <= 16.
# ---------------------------------------------------------------------------

@jax.jit
def pair_codes(codes: jnp.ndarray, lens: jnp.ndarray):
    """(R, L) → (R, ceil(L/2)) combined codes/lens."""
    return group_codes(codes, lens, 2)


@functools.partial(jax.jit, static_argnames=("k",))
def group_codes(codes: jnp.ndarray, lens: jnp.ndarray, k: int):
    """Combine k adjacent codes per element: (R, L) → (R, ceil(L/k)).

    Requires k * max_code_len <= 32 (the caller picks k = 32 //
    max_code_len) and that zero-length symbols carry code value 0 (the
    encoders mask invalid positions before grouping). Bit layout is
    unchanged — earlier symbols occupy higher bits — so decode is
    unaffected; the scatter count drops k×."""
    R, L = codes.shape
    pad = (-L) % k
    if pad:
        codes = jnp.pad(codes, ((0, 0), (0, pad)))
        lens = jnp.pad(lens, ((0, 0), (0, pad)))
    c = codes[:, 0::k].astype(jnp.uint32)
    l = lens[:, 0::k].astype(jnp.int32)
    for i in range(1, k):
        ci = codes[:, i::k].astype(jnp.uint32)
        li = lens[:, i::k].astype(jnp.int32)
        c = (c << jnp.clip(li, 0, 31).astype(jnp.uint32)) | ci
        l = l + li
    return c, l


@functools.partial(jax.jit, static_argnames=("group",))
def group_fixed2(values: jnp.ndarray, keep: jnp.ndarray, group: int = 16):
    """Pack 2-bit symbols in groups: (R, L) values/keep →
    (R, ceil(L/group)) codes/lens. Kept symbols concatenate MSB-first in
    position order; dropped positions contribute nothing. With group=16 the
    scatter count drops 16× for the DNA plain stream."""
    R, L = values.shape
    pad = (-L) % group
    v = jnp.pad(values.astype(jnp.uint32), ((0, 0), (0, pad)))
    k = jnp.pad(keep.astype(jnp.int32), ((0, 0), (0, pad)))
    Lp = v.shape[1]
    vg = v.reshape(R, Lp // group, group)
    kg = k.reshape(R, Lp // group, group)
    bits_before = (jnp.cumsum(kg, axis=2) - kg) * 2
    total = jnp.sum(kg, axis=2) * 2                      # (R, n_groups)
    shift = total[:, :, None] - bits_before - 2
    contrib = jnp.where(
        kg > 0, vg << jnp.clip(shift, 0, 31).astype(jnp.uint32), 0)
    return jnp.sum(contrib, axis=2).astype(jnp.uint32), total.astype(jnp.int32)