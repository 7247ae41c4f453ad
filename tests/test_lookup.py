"""ops/lookup: the pallas one-hot kernel is bit-exact vs the gather path.

The XLA variants (bf16x2/f32/int8/flat) only fire on the TPU backend; the
pallas kernel runs here in interpreter mode, which executes the same kernel
logic (one-hot tile, block-diagonal int8 planes, plane recombination) on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from phyngsc_tpu.ops import lookup


def _reference(sym: np.ndarray, tab: np.ndarray) -> np.ndarray:
    pos = np.arange(sym.shape[1])[None, :]
    return tab[pos, sym]


@pytest.mark.parametrize("R,L", [(100, 4), (256, 36), (300, 40),
                                 (128, 80), (64, 128)])
def test_pallas_lookup_matches_gather(R, L):
    rng = np.random.default_rng(R * 1000 + L)
    # full 16-bit fused-entry range: (len << 12) | code with len <= 12
    tab = ((rng.integers(0, 13, size=(L, 256)) << lookup.CODE_BITS)
           | rng.integers(0, 1 << lookup.CODE_BITS, size=(L, 256))
           ).astype(np.int32)
    sym = rng.integers(0, 256, size=(R, L)).astype(np.uint8)
    got = np.asarray(lookup.fused_lookup_pallas(
        jnp.asarray(sym), jnp.asarray(tab), interpret=True))
    np.testing.assert_array_equal(got, _reference(sym, tab))


def test_pallas_lookup_multi_chunk_boundary():
    # L > _PL_LC exercises the position-chunk concatenation path
    rng = np.random.default_rng(7)
    L = lookup._PL_LC * 2 + 8
    tab = rng.integers(0, 1 << 16, size=(L, 256)).astype(np.int32)
    sym = rng.integers(0, 256, size=(513, L)).astype(np.uint8)  # pads R too
    got = np.asarray(lookup.fused_lookup_pallas(
        jnp.asarray(sym), jnp.asarray(tab), interpret=True))
    np.testing.assert_array_equal(got, _reference(sym, tab))
