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


@pytest.mark.parametrize("A", [64, 128])
def test_pallas_lookup_narrow_tables(A):
    # alphabet-window slicing (lookup.window_np): tables with A < 256
    # columns, symbols pre-clipped to [0, A) by the caller
    rng = np.random.default_rng(A)
    R, L = 300, 36
    tab = rng.integers(0, 1 << 16, size=(L, A)).astype(np.int32)
    sym = rng.integers(0, A, size=(R, L)).astype(np.uint8)
    got = np.asarray(lookup.fused_lookup_pallas(
        jnp.asarray(sym), jnp.asarray(tab), interpret=True))
    np.testing.assert_array_equal(got, _reference(sym, tab))


def test_window_np():
    counts = np.zeros((3, 256), np.int64)
    counts[0, 33] = 5
    counts[2, 96] = 1
    off, A = lookup.window_np(counts)
    assert (off, A) == (33, 64)
    counts[1, 200] = 2
    off, A = lookup.window_np(counts)
    assert (off, A) == (0, 256)  # width 168 → full-table bucket, off pinned 0
    assert lookup.window_np(np.zeros((1, 256), np.int64)) == (0, 64)
    # window near the top of the byte range shifts off down to fit
    hi = np.zeros((1, 256), np.int64)
    hi[0, 250] = 1
    off, A = lookup.window_np(hi)
    assert off + A <= 256 and off <= 250 < off + A


def test_encode_device_windowed_matches_full():
    # quality encode with sliced tables + off == full-width encode
    from phyngsc_tpu.models import quality
    from phyngsc_tpu.config import CodecConfig

    rng = np.random.default_rng(11)
    R, L = 256, 36
    qual = (rng.integers(33, 74, size=(R, L))).astype(np.uint8)
    lens = np.full(R, L, np.int32)
    counts = quality.analyze(jnp.asarray(qual), jnp.asarray(lens))
    tabs, group = quality.build_tables_adaptive(np.asarray(counts),
                                                CodecConfig())
    off, A = lookup.window_np(np.asarray(counts))
    assert A < 256
    full = quality.encode_device(
        jnp.asarray(qual), jnp.asarray(lens), jnp.asarray(tabs.codes),
        jnp.asarray(tabs.lens), 64, 4096, group)
    win = quality.encode_device(
        jnp.asarray(qual), jnp.asarray(lens),
        jnp.asarray(np.ascontiguousarray(tabs.codes[:, off:off + A])),
        jnp.asarray(np.ascontiguousarray(tabs.lens[:, off:off + A])),
        64, 4096, group, off=np.int32(off))
    for a, b in zip(full, win):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_lookup_multi_chunk_boundary():
    # L > _PL_LC exercises the position-chunk concatenation path
    rng = np.random.default_rng(7)
    L = lookup._PL_LC * 2 + 8
    tab = rng.integers(0, 1 << 16, size=(L, 256)).astype(np.int32)
    sym = rng.integers(0, 256, size=(513, L)).astype(np.uint8)  # pads R too
    got = np.asarray(lookup.fused_lookup_pallas(
        jnp.asarray(sym), jnp.asarray(tab), interpret=True))
    np.testing.assert_array_equal(got, _reference(sym, tab))


# ---------------------------------------------------------------------------
# pallas LUT walk (bitpack.unpack_substreams_uniform_pallas)
# ---------------------------------------------------------------------------

from phyngsc_tpu.ops import bitpack, huffman
from phyngsc_tpu.utils.bitio import BitWriter


def _runs_from_planes(planes):
    """(T, V) LUT planes → (starts (T, 256), deltas (T, 256)) run arrays —
    the test-side inverse of the kernels' cumulative-delta evaluation."""
    planes = np.asarray(planes)
    T, V = planes.shape
    starts = np.full((T, 256), V, np.int32)
    deltas = np.zeros((T, 256), np.int32)
    for t in range(T):
        d = np.flatnonzero(np.diff(planes[t])) + 1
        st = np.concatenate([[0], d]).astype(np.int64)
        vals = planes[t][st]
        prev = np.concatenate([[0], vals[:-1]])
        k = min(st.shape[0], 256)
        starts[t, :k] = st[:k]
        deltas[t, :k] = (vals - prev)[:k]
    return starts, deltas


def _random_tables(rng, n_trees, alphabet, max_len):
    counts = rng.integers(1, 1000, size=(n_trees, alphabet))
    lens = huffman.build_code_lengths_batch(counts, max_len)
    codes = np.asarray(huffman.canonical_codes(lens))
    luts = []
    for t in range(n_trees):
        sym, ln = huffman.decode_lut(lens[t], max_len, -1)
        luts.append((ln.astype(np.int32) << 9) | sym.astype(np.int32))
    return lens, codes, np.stack(luts)


@pytest.mark.parametrize("S,T,n_trees,max_len", [
    (130, 70, 3, 8),      # lane padding + multi-tree + 8-bit windows
    (256, 130, 5, 12),    # T > one grid block, 12-bit windows
    (128, 128, 1, 6),     # shared single tree
])
def test_pallas_walk_matches_py_walk(S, T, n_trees, max_len):
    rng = np.random.default_rng(S + T)
    alphabet = 50
    lens, codes, luts = _random_tables(rng, n_trees, alphabet, max_len)
    tid_vec = rng.integers(0, n_trees, size=T).astype(np.int32)
    totals = rng.integers(0, T + 1, size=S).astype(np.int32)
    syms = rng.integers(0, alphabet, size=(S, T))

    # pack each substream on the host (word-aligned starts)
    words_parts, sub_words = [], []
    for s in range(S):
        bw = BitWriter()
        for t in range(int(totals[s])):
            tr = tid_vec[t]
            bw.put_bits(int(codes[tr, syms[s, t]]), int(lens[tr, syms[s, t]]))
        bw.flush()
        w = bitpack.bytes_to_words(bw.getvalue())
        words_parts.append(w)
        sub_words.append(w.shape[0])
    linear = (np.concatenate(words_parts) if words_parts
              else np.zeros(0, np.uint32))
    sub_words = np.array(sub_words, np.int32)

    dense = bitpack.dense_words_np(linear, sub_words)
    Sp = dense.shape[1]
    totals_p = np.zeros(Sp, np.int32)
    totals_p[:S] = totals
    st, dl = _runs_from_planes(luts)
    got = np.asarray(bitpack.unpack_substreams_uniform_pallas(
        jnp.asarray(dense), jnp.asarray(st[tid_vec]),
        jnp.asarray(dl[tid_vec]), jnp.asarray(totals_p),
        lut_bits=max_len, interpret=True))[:S]

    # reference: the python walk over the same streams
    start = np.concatenate([[0], np.cumsum(sub_words)[:-1]])
    valid = np.arange(T)[None, :] < totals[:, None]
    ref = bitpack._unpack_substreams_py(
        linear, start, luts, np.broadcast_to(tid_vec, (S, T)), valid,
        T, max_len)
    np.testing.assert_array_equal(np.where(valid, got, 0),
                                  np.where(valid, ref, 0))


def test_pallas_walk_shared_luts():
    rng = np.random.default_rng(99)
    lens, codes, luts = _random_tables(rng, 1, 30, 8)
    S, T = 140, 64
    totals = np.full(S, T, np.int32)
    syms = rng.integers(0, 30, size=(S, T))
    words_parts, sub_words = [], []
    for s in range(S):
        bw = BitWriter()
        for t in range(T):
            bw.put_bits(int(codes[0, syms[s, t]]), int(lens[0, syms[s, t]]))
        bw.flush()
        w = bitpack.bytes_to_words(bw.getvalue())
        words_parts.append(w)
        sub_words.append(w.shape[0])
    linear = np.concatenate(words_parts)
    sub_words = np.array(sub_words, np.int32)
    dense = bitpack.dense_words_np(linear, sub_words)
    Sp = dense.shape[1]
    totals_p = np.zeros(Sp, np.int32)
    totals_p[:S] = totals
    st, dl = _runs_from_planes(luts[:1])
    sh_s = np.ascontiguousarray(
        np.broadcast_to(st[0], (bitpack._WALK_TC, 256)))
    sh_d = np.ascontiguousarray(
        np.broadcast_to(dl[0], (bitpack._WALK_TC, 256)))
    got = np.asarray(bitpack.unpack_substreams_uniform_pallas(
        jnp.asarray(dense), jnp.asarray(sh_s), jnp.asarray(sh_d),
        jnp.asarray(totals_p), n_steps=T, shared_luts=True,
        lut_bits=8, interpret=True))[:S]
    start = np.concatenate([[0], np.cumsum(sub_words)[:-1]])
    valid = np.ones((S, T), bool)
    ref = bitpack._unpack_substreams_py(
        linear, start, luts, np.zeros((S, T), np.int32), valid, T, 8)
    np.testing.assert_array_equal(got, ref)


def test_pallas_walk_full_roundtrip(monkeypatch):
    """Full container round trip with the walk forced on (interpret mode on
    CPU) — exercises parse gating, dense layout, and both walk branches."""
    monkeypatch.setenv("PHYNGSC_WALK", "pallas")
    from phyngsc_tpu.config import CodecConfig
    from phyngsc_tpu.pipeline.compress import compress_bytes
    from phyngsc_tpu.pipeline.decompress import decompress_bytes
    from phyngsc_tpu.utils.fastq import synthesize_fastq

    cfg = CodecConfig(records_per_substream=4)
    data = synthesize_fastq(600, read_len=36, seed=11, ambiguity_rate=0.01)
    blob = compress_bytes(data, cfg)
    assert decompress_bytes(blob, cfg) == data


def test_pallas_walk_huffman_dna_roundtrip(monkeypatch):
    """DNA stays Huffman-coded when IUPAC symbols can't transfer (quality
    outside [33,40]) — exercises decode_huffman_walk under the forced walk."""
    monkeypatch.setenv("PHYNGSC_WALK", "pallas")
    from phyngsc_tpu.config import CodecConfig
    from phyngsc_tpu.pipeline.compress import compress_bytes
    from phyngsc_tpu.pipeline.decompress import decompress_bytes

    rng = np.random.default_rng(5)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(600):
        seq = acgt[rng.integers(0, 4, size=36)].copy()
        seq[rng.integers(0, 36)] = ord("N")  # high quality → no transfer
        qual = np.full(36, ord("I"), np.uint8)
        recs.append(b"@r%d\n" % i + seq.tobytes() + b"\n+\n"
                    + qual.tobytes() + b"\n")
    data = b"".join(recs)
    cfg = CodecConfig(records_per_substream=4)
    blob = compress_bytes(data, cfg)
    assert decompress_bytes(blob, cfg) == data


def test_pallas_walk_variable_length_roundtrip(monkeypatch):
    """Variable-length records under the forced walk: the masked quality
    walk (decode_device_walk_masked) + packed lens in the fused blob."""
    monkeypatch.setenv("PHYNGSC_WALK", "pallas")
    from phyngsc_tpu.config import CodecConfig
    from phyngsc_tpu.pipeline.compress import compress_bytes
    from phyngsc_tpu.pipeline.decompress import decompress_bytes

    rng = np.random.default_rng(17)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(500):
        n = int(rng.integers(20, 48))
        seq = acgt[rng.integers(0, 4, size=n)]
        qual = (rng.integers(33, 73, size=n)).astype(np.uint8)
        recs.append(b"@v%d\n" % i + seq.tobytes() + b"\n+\n"
                    + qual.tobytes() + b"\n")
    data = b"".join(recs)
    cfg = CodecConfig(records_per_substream=4)
    blob = compress_bytes(data, cfg)
    assert decompress_bytes(blob, cfg) == data


def test_pallas_walk_delta_roundtrip(monkeypatch):
    """SOLiD color-space reads under the forced walk (is_delta path: raw
    planes fetch, no packed-alphabet output)."""
    monkeypatch.setenv("PHYNGSC_WALK", "pallas")
    from phyngsc_tpu.config import CodecConfig
    from phyngsc_tpu.pipeline.compress import compress_bytes
    from phyngsc_tpu.pipeline.decompress import decompress_bytes

    rng = np.random.default_rng(23)
    digits = np.frombuffer(b"0123", np.uint8)
    recs = []
    for i in range(400):
        colors = digits[rng.integers(0, 4, size=35)]
        seq = b"T" + colors.tobytes()
        qual = (rng.integers(33, 70, size=36)).astype(np.uint8)
        recs.append(b"@s%d\n" % i + seq + b"\n+\n" + qual.tobytes() + b"\n")
    data = b"".join(recs)
    cfg = CodecConfig(records_per_substream=4)
    blob = compress_bytes(data, cfg)
    assert decompress_bytes(blob, cfg) == data


def test_dense_words_device_matches_np():
    rng = np.random.default_rng(31)
    for S in (1, 5, 130):
        sub = rng.integers(0, 40, size=S).astype(np.int32)
        total = int(sub.sum())
        words = rng.integers(1, 1 << 32, size=total, dtype=np.uint64
                             ).astype(np.uint32)
        ref = bitpack.dense_words_np(words, sub)
        Wmax, Sp = ref.shape
        # device path takes the bucket-padded linear upload
        up = np.zeros(total + 64, np.uint32)
        up[:total] = words
        got = np.asarray(bitpack.dense_words_device(
            jnp.asarray(up), jnp.asarray(sub), Wmax, Sp))
        np.testing.assert_array_equal(got, ref)


def test_banded_words_plane_matches_valid_cells():
    """banded_words_np + dense_words_banded == dense_words_np on every valid
    cell (w < sub[s]); padding cells may hold neighboring words (never read
    by the walks). Exercises a nonzero words_off and end-slack overread."""
    rng = np.random.default_rng(41)
    g = bitpack.DENSE_GROUP
    for S in (1, 7, 64, 200):
        sub = rng.integers(0, 60, size=S).astype(np.int32)
        total = int(sub.sum())
        words = rng.integers(0, 1 << 32, size=total, dtype=np.uint64
                             ).astype(np.uint32)
        ref = bitpack.dense_words_np(words, sub)
        Wmax, Sp = ref.shape
        banded = bitpack.banded_words_np(words, sub)
        prefix = rng.integers(0, 1 << 32, size=37, dtype=np.uint64
                              ).astype(np.uint32)  # unrelated header words
        blob = np.concatenate([prefix, banded,
                               np.zeros(Wmax * g, np.uint32)])
        got = np.asarray(bitpack.dense_words_banded(
            jnp.asarray(blob), jnp.int32(prefix.shape[0]),
            jnp.asarray(sub), Wmax, Sp))
        sub_pad = np.zeros(Sp, np.int32)
        sub_pad[:S] = sub
        valid = np.arange(Wmax)[:, None] < sub_pad[None, :]
        np.testing.assert_array_equal(got[valid], ref[valid])
        # device banded_total mirrors the host image length
        assert int(bitpack.banded_total(jnp.asarray(sub), Sp)) \
            == banded.shape[0]


def test_banded_padding_overhead_small():
    """The banded image's padding cost on near-uniform lanes (the real
    stream shape: adjacent substreams = adjacent records) stays within a
    few percent — the property that makes the wire layout a win."""
    rng = np.random.default_rng(43)
    sub = (90 + rng.integers(-3, 4, size=512)).astype(np.int32)
    total = int(sub.sum())
    banded = bitpack.banded_words_np(
        np.zeros(total, np.uint32), sub)
    assert banded.shape[0] <= total * 1.05


def test_sorts_densify_roundtrip(monkeypatch):
    """The linear-layout sorts densify (bitpack.DENSIFY='sorts') stays a
    working A/B alternative behind the banded default."""
    monkeypatch.setenv("PHYNGSC_WALK", "pallas")
    monkeypatch.setattr(bitpack, "DENSIFY", "sorts")
    from phyngsc_tpu.config import CodecConfig
    from phyngsc_tpu.pipeline.compress import compress_bytes
    from phyngsc_tpu.pipeline.decompress import decompress_bytes
    from phyngsc_tpu.utils.fastq import synthesize_fastq

    cfg = CodecConfig(records_per_substream=4)
    data = synthesize_fastq(400, read_len=36, seed=19, ambiguity_rate=0.01)
    blob = compress_bytes(data, cfg)
    assert decompress_bytes(blob, cfg) == data


def test_dense_words_pallas_matches_valid_cells():
    # the DMA-copy densify matches the sort densify on every valid cell
    # (w < sub[s]); padding cells deliberately hold neighboring words
    rng = np.random.default_rng(23)
    S, Sp = 37, 128
    sub = rng.integers(0, 300, size=S).astype(np.int32)
    total = int(sub.sum())
    words = rng.integers(0, 1 << 32, size=total, dtype=np.uint64
                         ).astype(np.uint32)
    Wmax, _ = bitpack.dense_geometry(sub)
    ref = np.asarray(bitpack.dense_words_device(
        jnp.asarray(words), jnp.asarray(sub), Wmax, Sp))
    got = np.asarray(bitpack.dense_words_pallas(
        jnp.asarray(words), jnp.asarray(sub), Wmax, Sp, interpret=True))
    sub_pad = np.zeros(Sp, np.int32)
    sub_pad[:S] = sub
    valid = np.arange(Wmax)[:, None] < sub_pad[None, :]
    np.testing.assert_array_equal(got[valid], ref[valid])


def test_luts_from_lens_device_matches_batch():
    """luts_from_lens_device (the 4-bit wire form's device rebuild) is
    bit-identical to huffman.decode_lut_batch for normal, singleton, and
    empty trees, at both 8- and 12-bit LUT widths."""
    rng = np.random.default_rng(53)
    for bits in (8, 12):
        lens_rows, sing_rows = [], []
        for k in range(12):
            f = np.zeros(256, np.int64)
            n = int(rng.integers(0, 80))
            if k == 0:
                pass                      # empty tree
            elif k == 1:
                f[int(rng.integers(0, 256))] = 5   # singleton
            else:
                idx = rng.choice(256, size=max(n, 2), replace=False)
                f[idx] = np.maximum(rng.zipf(1.5, size=max(n, 2)), 1)
            lens_rows.append(huffman.build_code_lengths(f, bits))
            sing_rows.append(huffman.singleton_of(f))
        lens = np.stack(lens_rows)
        sing = np.array(sing_rows, np.int32)
        sym, ln = huffman.decode_lut_batch(lens, bits, sing)
        planes = ((ln.astype(np.int32) << 9) | sym.astype(np.int32))
        wire = bitpack.pack_lens4_np(lens, sing)
        T = lens.shape[0]
        got = np.asarray(bitpack.luts_from_lens_device(
            jnp.asarray(wire[: T * 32]), jnp.asarray(wire[T * 32 :]),
            T, 1 << bits))
        np.testing.assert_array_equal(got, planes)


def test_canonical_codes_batch_matches_prefix_property():
    """Vectorized canonical_codes: prefix-free, ordered by (len, sym), and
    identical across 1-D and batched calls."""
    rng = np.random.default_rng(59)
    rows = []
    for _ in range(8):
        f = np.zeros(256, np.int64)
        idx = rng.choice(256, size=40, replace=False)
        f[idx] = np.maximum(rng.zipf(1.4, size=40), 1)
        rows.append(huffman.build_code_lengths(f, 12))
    lens = np.stack(rows)
    codes = huffman.canonical_codes(lens)
    for t in range(lens.shape[0]):
        np.testing.assert_array_equal(codes[t],
                                      huffman.canonical_codes(lens[t]))
        present = np.flatnonzero(lens[t])
        # left-aligned codes strictly increase in (len, sym) order and
        # consecutive codes of one length differ by 1
        order = sorted(present, key=lambda s: (lens[t][s], s))
        la = [int(codes[t][s]) << (16 - int(lens[t][s])) for s in order]
        assert all(a < b for a, b in zip(la, la[1:]))
        kraft = sum(1 << (12 - int(lens[t][s])) for s in present)
        assert kraft == 1 << 12


@pytest.mark.parametrize("R,L,A", [(100, 7, 256), (1030, 36, 256),
                                   (64, 5, 128)])
def test_pallas_position_histogram(R, L, A):
    from phyngsc_tpu.ops import histogram
    rng = np.random.default_rng(R + L)
    sym = rng.integers(0, A, size=(R, L)).astype(np.uint8)
    valid = rng.random((R, L)) < 0.8
    got = np.asarray(histogram.position_histogram_pallas(
        jnp.asarray(sym), jnp.asarray(valid), A, interpret=True))
    ref = np.zeros((L, A), np.int32)
    for p in range(L):
        np.add.at(ref[p], sym[valid[:, p], p], 1)
    np.testing.assert_array_equal(got, ref)
