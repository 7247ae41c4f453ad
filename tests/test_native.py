"""Native host runtime vs numpy reference paths."""

import numpy as np
import pytest

from phyngsc_tpu.utils import native
from phyngsc_tpu.utils.fastq import index_records, synthesize_fastq

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_index_matches_numpy(monkeypatch):
    data = synthesize_fastq(500, read_len=36, seed=0)
    buf = np.frombuffer(data, np.uint8)
    spans = native.index_records(buf)
    assert spans is not None
    # force the numpy path (the env var is only read at first lib load, so
    # patch the loader-level function instead)
    monkeypatch.setattr(native, "index_records", lambda *a, **k: None)
    idx = index_records(buf)
    for got, want in zip(spans, (idx.title_start, idx.title_end, idx.seq_start,
                                 idx.seq_end, idx.qual_start, idx.qual_end)):
        np.testing.assert_array_equal(got, want)


def test_index_tiny_records_not_truncated(monkeypatch):
    # minimum-size records (empty reads) stress the capacity estimate
    data = b"@\n\n+\n\n" * 100
    buf = np.frombuffer(data, np.uint8)
    spans = native.index_records(buf)
    assert spans is not None and spans[0].shape[0] == 100
    monkeypatch.setattr(native, "index_records", lambda *a, **k: None)
    idx = index_records(buf)
    assert idx.n_records == 100
    np.testing.assert_array_equal(spans[0], idx.title_start)


def test_index_rejects_invalid():
    # native path returns None on validation failure; fastq falls back to
    # numpy which raises with the precise record
    bad = b"@r1\nACGT\n+\nIII\n"
    assert native.index_records(np.frombuffer(bad, np.uint8)) is None


def test_gather_matches_numpy():
    rng = np.random.default_rng(1)
    buf = rng.integers(0, 256, size=10_000).astype(np.uint8)
    starts = rng.integers(0, 9000, size=64).astype(np.int64)
    lens = rng.integers(0, 40, size=64).astype(np.int32)
    got = native.gather(buf, starts, lens, 48)
    assert got is not None
    want = np.zeros((64, 48), np.uint8)
    for r in range(64):
        want[r, : lens[r]] = buf[starts[r] : starts[r] + lens[r]]
    np.testing.assert_array_equal(got, want)


def test_huffman_lengths_valid():
    from phyngsc_tpu.ops.huffman import singleton_of

    rng = np.random.default_rng(2)
    hist = np.zeros((6, 256), np.int64)
    hist[0, rng.choice(256, 40, replace=False)] = rng.zipf(1.5, 40)
    hist[1, :] = 1                      # full flat alphabet
    hist[2, 7] = 100                    # singleton
    hist[3, :32] = 2 ** np.arange(32)   # skewed → hits the length limit
    hist[4, 10] = 5
    hist[4, 20] = 5
    # hist[5] all zero → empty
    built = native.huffman_lengths(hist, 12)
    assert built is not None
    lens, singles = built
    for k in range(6):
        present = hist[k] > 0
        ls = lens[k].astype(np.int64)
        if present.sum() == 0:
            assert np.all(ls == 0) and singles[k] == -1
            continue
        if present.sum() == 1:
            assert singles[k] == singleton_of(hist[k])
            assert np.all(ls == 0)
            continue
        assert singles[k] == -1
        assert np.all(ls[present] >= 1) and np.all(ls[present] <= 12)
        assert np.all(ls[~present] == 0)
        kraft = np.sum(np.where(present, 2.0 ** (-ls.astype(float)), 0))
        assert kraft <= 1.0 + 1e-12
    # near-optimality on the zipf tree: within 6% of entropy + 1
    f = hist[0][hist[0] > 0].astype(float)
    p = f / f.sum()
    ent = -(p * np.log2(p)).sum()
    avg = (f * lens[0][hist[0] > 0]).sum() / f.sum()
    assert avg <= (ent + 1) * 1.06


def test_huffman_matches_roundtrip_in_codec():
    # the quality codec uses native tables when available — full loop check
    import jax.numpy as jnp

    from phyngsc_tpu.config import CodecConfig
    from phyngsc_tpu.models import quality

    cfg = CodecConfig(records_per_substream=8)
    rng = np.random.default_rng(3)
    R, L, G = 32, 12, 8
    qual = rng.integers(33, 70, size=(R, L)).astype(np.uint8)
    lens = np.full(R, L, np.int32)
    counts = quality.analyze(jnp.array(qual), jnp.array(lens))
    tables = quality.build_tables(np.asarray(counts), cfg)
    words, sub, tot = quality.encode_device(
        jnp.array(qual), jnp.array(lens), jnp.array(tables.codes),
        jnp.array(tables.lens), G, R * L,
    )
    got = quality.decode_device(
        words[: int(tot)], jnp.array(np.asarray(sub)), jnp.array(lens),
        jnp.array(tables.luts(cfg.max_code_len)), L, G, cfg.max_code_len,
    )
    np.testing.assert_array_equal(np.asarray(got), qual)


def test_native_unpack_substreams_matches_numpy():
    """The native OpenMP decode walk must be bit-identical to the numpy
    twin, including word-boundary crossings, invalid (masked) steps, and
    multi-tree LUTs."""
    import numpy as np

    from phyngsc_tpu.ops import bitpack, huffman
    from phyngsc_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(21)
    lut_bits = 12
    n_trees = 5
    # random length-limited trees over a 40-symbol alphabet
    counts = rng.integers(1, 500, size=(n_trees, 256))
    counts[:, 40:] = 0
    lens = huffman.build_code_lengths_batch(counts, lut_bits)
    codes = np.asarray(huffman.canonical_codes(lens))
    sym_l, ln_l = huffman.decode_lut_batch(lens, lut_bits)
    luts = (ln_l.astype(np.int32) << 9) | sym_l.astype(np.int32)

    S, T = 7, 190
    tree_ids = rng.integers(0, n_trees, size=(S, T)).astype(np.int32)
    valid = np.ones((S, T), bool)
    valid[:, 170:] = False  # exhausted tail on every substream
    syms = rng.choice(np.flatnonzero(counts[0] > 0), size=(S, T))
    # encode each substream with the chosen trees via the host packer
    sub_words = []
    for s in range(S):
        c = codes[tree_ids[s], syms[s]]
        l = lens[tree_ids[s], syms[s]].astype(np.int64)
        l[~valid[s]] = 0
        off = np.cumsum(l) - l
        n_w = int((off[-1] + l[-1] + 31) // 32) + 1
        sub_words.append(bitpack.pack_bits_scatter_np(c, l, off, n_w))
    sub_start = np.cumsum([0] + [w.shape[0] for w in sub_words])[:-1]
    words = np.concatenate(sub_words).astype(np.uint32)

    a = bitpack._unpack_substreams_py(
        words, sub_start.astype(np.int64), luts, tree_ids, valid, T, lut_bits)
    b = native.unpack_substreams(
        np.concatenate([words, np.zeros(2, np.uint32)]),
        sub_start.astype(np.int64), luts, tree_ids,
        valid, T, lut_bits)
    assert b is not None
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.where(valid, a, 0),
                                  np.where(valid, syms, 0))


def test_numeric_stats_matches_numpy_pre():
    """phyngsc_numeric_stats == the numpy _numeric_pre reductions, including
    strided (sliced) input, partial final blocks, and single-record blocks
    (VERDICT r4 next #4 — the title planner's one-pass native twin)."""
    if not native.available() or native.numeric_stats(
            np.zeros((2, 1), np.int64), 32) is None:
        pytest.skip("native numeric_stats unavailable")
    import phyngsc_tpu.utils.native as nat
    from phyngsc_tpu.models import title

    rng = np.random.default_rng(5)
    for R in (2, 31, 32, 33, 64, 65, 96, 97, 5003):
        full = np.zeros((R, 32), np.int64)
        full[:, 0] = np.arange(R)
        full[:, 1] = 7
        full[:, 2] = np.repeat(rng.integers(0, 10**6, (R + 31) // 32),
                               32)[:R]
        full[:, 3] = rng.integers(-5, 10**9, R)
        V = full[:, :4]                       # strided slice, no copy
        orig = nat.numeric_stats
        nat.numeric_stats = lambda *a, **k: None
        try:
            p_np = title._numeric_pre(V)
        finally:
            nat.numeric_stats = orig
        p_nat = title._numeric_pre(V)
        for name in ("vmin", "vmax", "dmin", "dmax"):
            np.testing.assert_array_equal(
                getattr(p_np, name), getattr(p_nat, name),
                err_msg=f"{name} R={R}")
        np.testing.assert_array_equal(p_np.const, p_nat.const)
        np.testing.assert_array_equal(p_np.dconst, p_nat.dconst)
        np.testing.assert_array_equal(p_np.first_d, p_nat.first_d)
        # planner decisions identical to the original per-field path
        for f in range(V.shape[1]):
            a = title._numeric_plan_from_values(V[:, f], 12)
            b = title._numeric_plan_from_values(V[:, f], 12, p_nat, f)
            assert (a.mode, a.width, a.base) == (b.mode, b.width, b.base)


def test_pack_fixed_and_byte_scan_match_numpy():
    """phyngsc_pack_fixed/byte_scan == the numpy transfer pack paths, for
    every mode and odd tails."""
    from phyngsc_tpu.ops import transfer as tr

    if native.pack_fixed(np.zeros(4, np.uint8), 2) is None:
        pytest.skip("native pack_fixed unavailable")
    rng = np.random.default_rng(9)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    for n in (1, 5, 16, 17, 4093, 65536):
        f = acgt[rng.integers(0, 4, size=n)]
        np.testing.assert_array_equal(
            native.pack_fixed(f, 2, native.PACK_ACGT2),
            tr._pack_fixed_np((f >> 1) & 3, 2))
        fn = f.copy()
        fn[rng.integers(0, n, size=max(1, n // 9))] = ord("N")
        np.testing.assert_array_equal(
            native.pack_fixed(fn, 3, native.PACK_ACGTN3),
            tr._pack_fixed_np(
                np.where(fn == 78, 4, (fn >> 1) & 3).astype(np.uint32), 3))
        q = rng.integers(33, 97, size=n).astype(np.uint8)
        q[: n // 7] = 0
        np.testing.assert_array_equal(
            native.pack_fixed(q, 6, native.PACK_QUAL6),
            tr._pack_fixed_np(
                np.where(q == 0, 0, q.astype(np.int32) - 33
                         ).astype(np.uint32), 6))
        raw = rng.integers(0, 256, size=n).astype(np.uint8)
        np.testing.assert_array_equal(
            native.pack_fixed(raw, 8, native.PACK_RAW),
            tr._pack_fixed_np(raw, 8))
        sc = native.byte_scan(raw)
        a = ((raw == 0) | (raw == 65) | (raw == 67) | (raw == 71)
             | (raw == 84))
        assert sc["n_non_acgt"] == int(np.count_nonzero(~a))
        assert sc["n_N"] == int(np.count_nonzero(raw == 78))
        assert sc["n_ge128"] == int(np.count_nonzero(raw >= 128))
        ok = (raw == 0) | ((raw >= 33) & (raw <= 96))
        assert sc["n_non_q6"] == int(np.count_nonzero(~ok))


def test_pack_seq_qual_native_matches_numpy_fallback(monkeypatch):
    """pack_seq_np/pack_qual_np produce identical (mode, words) with and
    without the native lib, across all four sequence modes."""
    from phyngsc_tpu.ops import transfer as tr

    if native.byte_scan(np.zeros(4, np.uint8)) is None:
        pytest.skip("native unavailable")
    rng = np.random.default_rng(4)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    planes = []
    pure = acgt[rng.integers(0, 4, size=(300, 36))]
    planes.append(pure)                                    # SEQ_2BIT
    exc = pure.copy()
    exc[rng.random(exc.shape) < 0.01] = ord("Y")
    planes.append(exc)                                     # SEQ_2BIT_EXC
    nn = pure.copy()
    nn[rng.random(nn.shape) < 0.2] = ord("N")
    planes.append(nn)                                      # SEQ_3BIT
    raw = rng.integers(0, 255, size=(300, 36)).astype(np.uint8)
    planes.append(raw)                                     # SEQ_RAW
    quals = [rng.integers(33, 97, size=(300, 36)).astype(np.uint8),
             rng.integers(0, 255, size=(300, 36)).astype(np.uint8)]

    got_n = [tr.pack_seq_np(p) for p in planes] \
        + [tr.pack_qual_np(q) for q in quals]
    monkeypatch.setattr(native, "byte_scan", lambda *a: None)
    monkeypatch.setattr(native, "pack_fixed", lambda *a, **k: None)
    got_np = [tr.pack_seq_np(p) for p in planes] \
        + [tr.pack_qual_np(q) for q in quals]
    for (m1, w1), (m2, w2) in zip(got_n, got_np):
        assert m1 == m2
        np.testing.assert_array_equal(w1, w2)


def test_decode_tail_matches_numpy():
    """phyngsc_decode_tail == the numpy lane-unpack + restore math, in both
    qual8 (pre-restore planes) and small (post-restore) modes."""
    from phyngsc_tpu.models import dna
    from phyngsc_tpu.pipeline import subblock as sb

    if native.decode_tail(np.zeros(1, np.uint32), np.zeros(1, np.uint32),
                          0, 2, 8, False, False, np.zeros(32, np.uint8),
                          dna.AMB_CHAR) is None:
        pytest.skip("native decode_tail unavailable")
    rng = np.random.default_rng(12)
    for w, qb, qual8 in ((2, 6, False), (3, 8, False), (5, 8, True),
                         (4, 8, True)):
        n = 4093
        per_s, per_q = sb._OUT_PER[w], sb._OUT_PER[qb]
        idx = rng.integers(0, 1 << w, size=n).astype(np.uint32)
        if qual8:
            q = np.concatenate([rng.integers(33, 97, size=n // 2),
                                rng.integers(130, 250, size=n - n // 2)])
            rng.shuffle(q)
        else:
            q = rng.integers(0, 1 << min(qb, 7), size=n)
        q = q.astype(np.uint32)

        def pack(vals, width, per):
            pad = (-vals.size) % per
            v = np.concatenate([vals, np.zeros(pad, np.uint32)])
            sh = (32 - width * (np.arange(per) + 1)).astype(np.uint32)
            return np.bitwise_or.reduce(
                v.reshape(-1, per) << sh[None, :], axis=1)

        sw = pack(idx, w, per_s)
        qw = pack(q, qb, per_q)
        alpha = np.zeros(32, np.uint8)
        alpha[: 1 << w] = rng.integers(65, 90, size=1 << w)
        plus33 = qb == 6
        seq_n, qual_n = native.decode_tail(sw, qw, n, w, qb, plus33, qual8,
                                           alpha, dna.AMB_CHAR)
        # numpy reference
        if qual8:
            qt = q.astype(np.int16)
            moved = qt >= 128
            code = np.clip((qt - 112) >> 3, 0, 16)
            seq_r = np.where(moved, dna.AMB_CHAR[code], alpha[idx])
            qual_r = np.where(moved, (qt - 112 - (code << 3) + 33
                                      ).astype(np.int16), qt)
        else:
            seq_r = alpha[idx]
            qual_r = q + 33 if plus33 else q
        np.testing.assert_array_equal(seq_n, seq_r.astype(np.uint8))
        np.testing.assert_array_equal(qual_n, qual_r.astype(np.uint8))


def test_gather3_matches_separate_gathers():
    """phyngsc_gather3 == three _gather_matrix calls + the qual max."""
    from phyngsc_tpu.pipeline.subblock import _gather_matrix
    from phyngsc_tpu.utils.fastq import index_records, synthesize_fastq

    data = synthesize_fastq(500, read_len=36, seed=6, variable_length=True)
    buf = np.frombuffer(data, np.uint8)
    idx = index_records(buf)
    lens = idx.seq_len.astype(np.int32)
    tlens = (idx.title_end - idx.title_start).astype(np.int32)
    TL, L = int(tlens.max()), int(lens.max())
    g3 = native.gather3(buf, idx.title_start, tlens, TL,
                        idx.seq_start, idx.qual_start, lens, L)
    if g3 is None:
        pytest.skip("native gather3 unavailable")
    titles, seq, qual, qmax = g3
    np.testing.assert_array_equal(
        titles, _gather_matrix(buf, idx.title_start,
                               tlens.astype(np.int64), TL))
    np.testing.assert_array_equal(
        seq, _gather_matrix(buf, idx.seq_start, lens.astype(np.int64), L))
    ref_q = _gather_matrix(buf, idx.qual_start, lens.astype(np.int64), L)
    np.testing.assert_array_equal(qual, ref_q)
    assert qmax == int(ref_q.max())
