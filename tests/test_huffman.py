import numpy as np
import pytest

from phyngsc_tpu.ops import huffman

from phyngsc_tpu.ops.huffman import (
    build_code_lengths,
    build_code_lengths_batch,
    canonical_codes,
    decode_lut,
    load_table,
    store_table,
)
from phyngsc_tpu.utils.bitio import BitReader, BitWriter


def kraft(lens):
    lens = np.asarray(lens, dtype=np.int64)
    return float(np.sum(np.where(lens > 0, 2.0 ** (-lens.astype(np.float64)), 0.0)))


def entropy_bits(freqs):
    f = np.asarray(freqs, dtype=np.float64)
    p = f[f > 0] / f.sum()
    return float(-(p * np.log2(p)).sum() * f.sum())


def encoded_bits(freqs, lens):
    return float(np.sum(np.asarray(freqs, dtype=np.float64) * lens))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("alpha", [2, 5, 41, 256])
def test_lengths_near_entropy(seed, alpha):
    rng = np.random.default_rng(seed)
    freqs = np.zeros(256, dtype=np.int64)
    idx = rng.choice(256, size=alpha, replace=False)
    freqs[idx] = rng.zipf(1.5, size=alpha)
    lens = build_code_lengths(freqs, max_len=12)
    assert np.all((lens[idx] >= 1) & (lens[idx] <= 12))
    assert np.all(lens[freqs == 0] == 0)
    assert kraft(lens) <= 1.0 + 1e-12
    h = entropy_bits(freqs)
    got = encoded_bits(freqs, lens)
    # within Huffman bound + small limiting penalty
    assert got <= h + freqs.sum() * 1.05 + 16


def test_skewed_hits_length_limit():
    # geometric frequencies would want depth ~30 unbounded
    freqs = np.zeros(64, dtype=np.int64)
    freqs[:32] = 2 ** np.arange(32, 0, -1, dtype=np.int64)
    lens = build_code_lengths(freqs, max_len=12)
    assert int(lens.max()) == 12
    assert kraft(lens) <= 1.0 + 1e-12


def test_single_and_empty_alphabet():
    from phyngsc_tpu.ops.huffman import singleton_of

    lens = build_code_lengths(np.zeros(16, dtype=np.int64), max_len=12)
    assert np.all(lens == 0)
    assert singleton_of(np.zeros(16, dtype=np.int64)) == -1
    f = np.zeros(16, dtype=np.int64)
    f[7] = 100
    # singleton alphabet → zero-bit code, identity via singleton_of
    lens = build_code_lengths(f, max_len=12)
    assert np.all(lens == 0)
    assert singleton_of(f) == 7


def test_full_alphabet_at_limit():
    # 256 equiprobable symbols with max_len 8 → exactly 8 bits each
    freqs = np.ones(256, dtype=np.int64)
    lens = build_code_lengths(freqs, max_len=8)
    assert np.all(lens == 8)
    assert abs(kraft(lens) - 1.0) < 1e-12


def test_canonical_prefix_free():
    rng = np.random.default_rng(3)
    freqs = rng.integers(0, 1000, size=100).astype(np.int64)
    lens = build_code_lengths(freqs, max_len=12)
    codes = canonical_codes(lens)
    present = np.flatnonzero(lens)
    # pad all codes to 12 bits and check intervals are disjoint
    spans = []
    for s in present:
        l = int(lens[s])
        lo = int(codes[s]) << (12 - l)
        spans.append((lo, lo + (1 << (12 - l))))
    spans.sort()
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 <= a2, "overlapping code intervals → not prefix free"


def test_decode_lut_inverts_codes():
    rng = np.random.default_rng(4)
    freqs = rng.integers(1, 50, size=40).astype(np.int64)
    lens = build_code_lengths(freqs, max_len=10)
    codes = canonical_codes(lens)
    sym, length = decode_lut(lens, lut_bits=10)
    for s in np.flatnonzero(lens):
        l = int(lens[s])
        window = int(codes[s]) << (10 - l)
        assert sym[window] == s and length[window] == l
        # any suffix garbage still decodes to the same symbol
        assert sym[window + (1 << (10 - l)) - 1] == s


def test_table_serialization_roundtrip():
    from phyngsc_tpu.ops.huffman import singleton_of

    rng = np.random.default_rng(5)
    for alpha in [0, 1, 17, 256]:
        freqs = np.zeros(256, dtype=np.int64)
        if alpha:
            idx = rng.choice(256, size=alpha, replace=False)
            freqs[idx] = rng.integers(1, 10_000, size=alpha)
        lens = build_code_lengths(freqs, max_len=12)
        single = singleton_of(freqs)
        bw = BitWriter()
        store_table(bw, lens, single)
        bw.flush()
        got_lens, got_single = load_table(BitReader(bw.getvalue()), 256)
        np.testing.assert_array_equal(got_lens, lens)
        assert got_single == single


def test_batch_build():
    rng = np.random.default_rng(6)
    freqs = rng.integers(0, 100, size=(5, 64)).astype(np.int64)
    lens = build_code_lengths_batch(freqs, max_len=12)
    assert lens.shape == (5, 64)
    for k in range(5):
        np.testing.assert_array_equal(lens[k], build_code_lengths(freqs[k], 12))


def _unbounded_huffman_cost(f: np.ndarray) -> int:
    """Optimal unbounded-depth Huffman cost = sum of all internal node
    weights (the classic merge-cost identity) — an independent oracle for
    the package-merge exactness check below."""
    import heapq

    h = [int(x) for x in f[f > 0]]
    heapq.heapify(h)
    cost = 0
    while len(h) > 1:
        a = heapq.heappop(h)
        b = heapq.heappop(h)
        cost += a + b
        heapq.heappush(h, a + b)
    return cost


def test_package_merge_optimal_and_kraft_complete():
    """build_code_lengths is exact package-merge: Kraft sum exactly 1 and
    cost equals the unbounded Huffman optimum whenever the length cap is
    slack (when it exceeds the optimum, the cap must be binding)."""
    rng = np.random.default_rng(42)
    slack_checked = 0
    for _ in range(80):
        A = int(rng.integers(3, 257))
        n = int(rng.integers(2, min(A, 180)))
        f = np.zeros(A, np.int64)
        idx = rng.choice(A, size=n, replace=False)
        f[idx] = np.maximum(rng.zipf(1.5, size=n).astype(np.int64), 1)
        lo = max(2, int(np.ceil(np.log2(n))))
        L = int(rng.integers(lo, 13)) if lo < 13 else 12
        pm = huffman.build_code_lengths(f, L)
        assert int(pm.max()) <= L
        kraft = sum(1 << (L - int(l)) for l in pm[pm > 0])
        assert kraft == (1 << L)
        cost_pm = int((f * pm).sum())
        opt = _unbounded_huffman_cost(f)
        assert cost_pm >= opt
        if cost_pm == opt:
            slack_checked += 1
        else:
            # only a binding cap may cost extra bits
            assert int(pm.max()) == L
    assert slack_checked > 0  # the exactness is observable, not theoretical


def test_package_merge_native_matches_python():
    from phyngsc_tpu.utils import native

    rng = np.random.default_rng(5)
    f = np.zeros((6, 256), np.int64)
    for k in range(6):
        n = int(rng.integers(0, 250))
        if n:
            idx = rng.choice(256, size=n, replace=False)
            f[k, idx] = np.maximum(rng.zipf(1.4, size=n).astype(np.int64), 1)
    out = native.huffman_lengths(f, 12)
    if out is None:
        import pytest

        pytest.skip("native library unavailable")
    nat_lens, nat_sing = out
    np.testing.assert_array_equal(
        nat_lens, huffman.build_code_lengths_batch(f, 12))
    np.testing.assert_array_equal(nat_sing, huffman.singleton_of_batch(f))
