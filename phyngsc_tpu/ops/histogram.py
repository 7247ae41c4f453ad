"""Batched per-position symbol histograms.

Replaces the reference's thread-local count loops + critical-section merge
(quality_stats accumulation, tasks.cpp:260-286 and the omp critical reduction
phyNGSC.cpp:622-653). On TPU the "thread team" is the VPU: histograms are a
masked-compare reduction over record chunks, accumulated with `lax.scan` so
the (chunk × positions × alphabet) one-hot never materializes in HBM. The
cross-chip merge is a `psum` over the data mesh axis (see parallel/).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: records per grid block / rows per inner accumulation step
_H_RC = 1024
_H_RSUB = 128


def _hist_rsub(Lp: int) -> int:
    """Rows per inner one-hot step: the (rsub, Lp, A) compare tile is the
    kernel's VMEM high-water mark, so long reads shrink the row count
    (divisors of _H_RC only) to keep rsub*Lp*A*4 under the scoped limit —
    128 rows x 80 positions (the short-read shapes) is the proven budget."""
    for rsub in (128, 64, 32, 16, 8):
        if rsub * Lp <= 128 * 80:
            return rsub
    return 8


def _make_hist_kernel(rsub: int):
    def kernel(sym_ref, out_ref):
        """Invalid cells arrive pre-masked to the sentinel value A (out of
        the iota's range), so the inner loop is the bare one-hot compare +
        row sum — no mask operand, no i8 widen, no AND (measured r4: the
        3-op inner loop was ~40% slower and doubled the block's VMEM input
        traffic)."""
        k = pl.program_id(0)
        RC, L = sym_ref.shape
        A = out_ref.shape[1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (rsub, L, A), 2)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def sub(j, acc):
            s = sym_ref[pl.ds(j * rsub, rsub)]
            oh = s[:, :, None] == iota
            return acc + jnp.sum(oh.astype(jnp.int32), axis=0)

        acc = jax.lax.fori_loop(0, RC // rsub, sub,
                                jnp.zeros(out_ref.shape, jnp.int32))
        out_ref[:] += acc

    return kernel


@functools.partial(jax.jit, static_argnames=("alphabet_size", "interpret"))
def position_histogram_pallas(symbols: jnp.ndarray, valid: jnp.ndarray,
                              alphabet_size: int = 256,
                              interpret: bool = False) -> jnp.ndarray:
    """Pallas twin of position_histogram: the (rows, L, A) one-hot lives in
    VMEM tiles and the (L, A) accumulator stays resident across grid blocks
    (the XLA scan round-trips its per-chunk one-hot through HBM). Masking
    happens OUTSIDE the kernel: invalid cells become the sentinel A, which
    no iota lane matches."""
    R, L = symbols.shape
    A = alphabet_size
    Lp = -(-L // 8) * 8
    Rp = -(-R // _H_RC) * _H_RC
    sym = jnp.where(valid, symbols.astype(jnp.int32), A)
    sym = jnp.pad(sym, ((0, Rp - R), (0, Lp - L)), constant_values=A)
    out = pl.pallas_call(
        _make_hist_kernel(_hist_rsub(Lp)),
        grid=(Rp // _H_RC,),
        in_specs=[
            pl.BlockSpec((_H_RC, Lp), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lp, A), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Lp, A), jnp.int32),
        interpret=interpret,
    )(sym)
    return out[:L]


@functools.partial(jax.jit, static_argnames=("alphabet_size", "chunk"))
def position_histogram(symbols: jnp.ndarray, valid: jnp.ndarray,
                       alphabet_size: int = 256, chunk: int = 2048) -> jnp.ndarray:
    """Per-position histogram.

    symbols (R, L) uint8/int32, valid (R, L) bool → counts (L, alphabet) int32.
    TPU takes the pallas kernel (PHYNGSC_HIST=xla opts out); elsewhere a
    chunked lax.scan whose (chunk, L, A) one-hot stays fused.
    """
    if (jax.default_backend() == "tpu"
            and os.environ.get("PHYNGSC_HIST", "pallas") == "pallas"):
        return position_histogram_pallas(symbols, valid, alphabet_size)
    R, L = symbols.shape
    pad = (-R) % chunk
    if pad:
        symbols = jnp.pad(symbols, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0)))
    n_chunks = symbols.shape[0] // chunk
    sym = symbols.reshape(n_chunks, chunk, L).astype(jnp.int32)
    msk = valid.reshape(n_chunks, chunk, L)
    ids = jnp.arange(alphabet_size, dtype=jnp.int32)

    def step(acc, xs):
        s, m = xs
        onehot = (s[:, :, None] == ids[None, None, :]) & m[:, :, None]
        return acc + jnp.sum(onehot.astype(jnp.int32), axis=0), None

    init = jnp.zeros((L, alphabet_size), jnp.int32)
    counts, _ = jax.lax.scan(step, init, (sym, msk))
    return counts


@functools.partial(jax.jit, static_argnames=("alphabet_size", "chunk"))
def global_histogram(symbols: jnp.ndarray, valid: jnp.ndarray,
                     alphabet_size: int = 256, chunk: int = 2048) -> jnp.ndarray:
    """Whole-stream histogram (the reference's dna_occ / quality_stats[0] row,
    phyNGSC.cpp:595-598, tasks.cpp:280-284): counts (alphabet,) int32."""
    return jnp.sum(
        position_histogram(symbols, valid, alphabet_size, chunk), axis=0
    )
