"""Shape bucketing: stable jit shapes across sub-blocks.

Every distinct (R, L) pair compiles a fresh XLA executable; sub-blocks differ
slightly in record count (byte-based splits, last sub-block, per-writer
remainders), so un-bucketed shapes trigger a recompile storm (observed: 4
writers → 4× compiles of every kernel). Padded records have zero length and
emit zero bits; true counts travel in the meta section.
"""

from __future__ import annotations


def bucket_records(R: int, G: int, shards: int = 1) -> int:
    """Round the record axis up to a power of two (min 512), then to a
    multiple of the substream width G (× the data-shard count, so shard
    boundaries align with substream boundaries)."""
    Rp = max(R, 512)
    Rp = 1 << (Rp - 1).bit_length()
    m = G * max(shards, 1)
    return Rp + ((-Rp) % m)


def bucket_length(L: int) -> int:
    """Round the position axis to a multiple of 4 (common read lengths 36/76/
    100 are already multiples; waste is <= 3 positions otherwise)."""
    return max(4, (L + 3) // 4 * 4)
