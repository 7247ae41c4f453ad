"""Long-read quality modeling (VERDICT r3 weak #4 / next #6).

v4 groups adjacent positions proportionally onto <= MAX_TREES trees
(quality.tree_of_position) instead of collapsing every position >= 256 into
the last tree; the reference allocates one tree per position unconditionally
(tasks.cpp:590-605), which a TPU LUT-walk cannot afford for unbounded L.
"""

import numpy as np
import pytest

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.models import quality
from phyngsc_tpu.ops import huffman
from phyngsc_tpu.pipeline.compress import compress_bytes
from phyngsc_tpu.pipeline.decompress import decompress_bytes
from phyngsc_tpu.utils.fastq import synthesize_fastq


def _longread_fastq(n_rec: int, read_len: int, seed: int = 0) -> bytes:
    """Position-trended qualities (the realistic long-read shape: quality
    degrades along the read) over ACGT sequence."""
    rng = np.random.default_rng(seed)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    trend = 70 - np.arange(read_len) * 30.0 / read_len
    recs = []
    for i in range(n_rec):
        seq = acgt[rng.integers(0, 4, size=read_len)]
        q = np.clip(np.rint(trend + rng.normal(0, 3, size=read_len)),
                    33, 104).astype(np.uint8)
        recs.append(b"@long.%d\n" % i + seq.tobytes() + b"\n+\n"
                    + q.tobytes() + b"\n")
    return b"".join(recs)


def test_tree_of_position_mappings():
    import jax.numpy as jnp

    pos = jnp.arange(1000, dtype=jnp.int32)
    # short reads: identity under both rules
    np.testing.assert_array_equal(
        np.asarray(quality.tree_of_position(pos[:200], 200, 200)),
        np.arange(200))
    # v4 grouped: proportional, non-decreasing, covers all trees
    g = np.asarray(quality.tree_of_position(pos, 256, 1000))
    assert g[0] == 0 and g[-1] == 255
    assert np.all(np.diff(g) >= 0)
    assert np.unique(g).shape[0] == 256
    np.testing.assert_array_equal(g, np.arange(1000) * 256 // 1000)
    # legacy (v1-v3): tail shares the last tree
    leg = np.asarray(quality.tree_of_position(pos, 256, 1000, legacy=True))
    np.testing.assert_array_equal(leg, np.minimum(np.arange(1000), 255))
    # encode-side histogram grouping matches the decode mapping
    np.testing.assert_array_equal(quality.tree_group_ids(1000, 256), g)


@pytest.mark.parametrize("read_len,n_rec", [(300, 400), (1000, 200)])
def test_longread_roundtrip(read_len, n_rec):
    data = _longread_fastq(n_rec, read_len, seed=read_len)
    cfg = CodecConfig(records_per_substream=4, subblock_input_bytes=1 << 30)
    comp = compress_bytes(data, cfg, 1)
    assert decompress_bytes(comp, cfg) == data


def test_longread_roundtrip_walk(monkeypatch):
    """300 bp under the forced pallas walk (small enough for per-step
    tables)."""
    monkeypatch.setenv("PHYNGSC_WALK", "pallas")
    data = _longread_fastq(300, 300, seed=5)
    cfg = CodecConfig(records_per_substream=4, subblock_input_bytes=1 << 30)
    comp = compress_bytes(data, cfg, 1)
    assert decompress_bytes(comp, cfg) == data


def test_longread_walk_engages_beyond_step_cap(monkeypatch):
    """1000 bp with G*L > WALK_PER_STEP_MAX (VERDICT r4 next #2): the walk
    must ENGAGE via period-tiled shared tables — no silent XLA-walk cliff —
    and round-trip byte-exactly."""
    monkeypatch.setenv("PHYNGSC_WALK", "pallas")
    from phyngsc_tpu.ops import bitpack
    from phyngsc_tpu.pipeline import subblock

    cfg = CodecConfig(records_per_substream=32, subblock_input_bytes=1 << 30,
                      auto_substream=False)
    data = _longread_fastq(96, 1000, seed=9)
    comp = compress_bytes(data, cfg, 1)

    walked = []
    orig = subblock._decode_walk_fused

    def spy(*a, **kw):
        walked.append(kw.get("Lt"))
        return orig(*a, **kw)

    monkeypatch.setattr(subblock, "_decode_walk_fused", spy)
    assert decompress_bytes(comp, cfg) == data
    assert walked, "pallas walk did not engage at 1000 bp"
    assert 32 * 1000 > bitpack.WALK_PER_STEP_MAX  # the period path ran


def test_longread_walk_variable_lengths(monkeypatch):
    """Variable-length long reads through the masked walk's period path."""
    monkeypatch.setenv("PHYNGSC_WALK", "pallas")
    rng = np.random.default_rng(23)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(96):
        n = int(rng.integers(900, 1001))
        seq = acgt[rng.integers(0, 4, size=n)]
        q = rng.integers(35, 71, size=n).astype(np.uint8)
        recs.append(b"@lrv%d\n" % i + seq.tobytes() + b"\n+\n"
                    + q.tobytes() + b"\n")
    data = b"".join(recs)
    cfg = CodecConfig(records_per_substream=32, subblock_input_bytes=1 << 30,
                      auto_substream=False)
    comp = compress_bytes(data, cfg, 1)
    assert decompress_bytes(comp, cfg) == data


def test_longread_grouped_ratio_within_2pct():
    """Grouped-tree modeling cost stays within 2% of full per-position
    modeling at 1000 bp (VERDICT r3 next #6 'Done' bar). Computed exactly
    from histograms x optimal code lengths."""
    rng = np.random.default_rng(11)
    L, R = 1000, 2000
    trend = 70 - np.arange(L) * 30.0 / L
    q = np.clip(np.rint(trend[None, :] + rng.normal(0, 3, size=(R, L))),
                33, 104).astype(np.int64)
    hist = np.zeros((L, 256), np.int64)
    for p in range(L):
        hist[p] = np.bincount(q[:, p], minlength=256)

    def cost(h2d, lens2d):
        return int((h2d * lens2d.astype(np.int64)).sum())

    # per-position modeling (the reference's unconditional allocation)
    from phyngsc_tpu.utils import native

    built = native.huffman_lengths(hist, 12)
    if built is not None:
        pp_lens = built[0]
    else:
        pp_lens = huffman.build_code_lengths_batch(hist, 12)
    per_position = cost(hist, pp_lens)

    gid = quality.tree_group_ids(L, quality.MAX_TREES)
    ghist = np.zeros((quality.MAX_TREES, 256), np.int64)
    np.add.at(ghist, gid, hist)
    built = native.huffman_lengths(ghist, 12)
    g_lens = built[0] if built is not None else \
        huffman.build_code_lengths_batch(ghist, 12)
    grouped = cost(hist, g_lens[gid])

    # and the v1-v3 tail-shared mapping, for the record: it must be worse
    tid_legacy = np.minimum(np.arange(L), quality.MAX_TREES - 1)
    lhist = np.zeros((quality.MAX_TREES, 256), np.int64)
    np.add.at(lhist, tid_legacy, hist)
    built = native.huffman_lengths(lhist, 12)
    l_lens = built[0] if built is not None else \
        huffman.build_code_lengths_batch(lhist, 12)
    legacy = cost(hist, l_lens[tid_legacy])

    assert grouped <= per_position * 1.02
    assert grouped < legacy


def test_v3_footer_reads_as_legacy(monkeypatch):
    """A v3 container decodes with the legacy tail mapping (the decompress
    driver derives legacy_tail_trees from Footer.version)."""
    from phyngsc_tpu.container import footer as footermod
    from phyngsc_tpu.pipeline import subblock as sbmod

    data = _longread_fastq(50, 40, seed=9)   # short reads: rules coincide
    comp_v4 = compress_bytes(data, CodecConfig(records_per_substream=4), 1)
    foot = footermod.read_footer(comp_v4)
    assert foot.version == footermod.VERSION == 4

    # re-emit the same container with a v3 footer byte (patch only for the
    # write — the read gate must keep accepting v4 afterwards)
    with monkeypatch.context() as mp:
        mp.setattr(footermod, "VERSION", 3)
        comp_v3 = compress_bytes(data, CodecConfig(records_per_substream=4),
                                 1)
    assert footermod.read_footer(comp_v3).version == 3

    seen = []
    orig = sbmod._decode_parse

    def spy(payload, cfg, buckets=None, executor=None):
        seen.append(cfg.legacy_tail_trees)
        return orig(payload, cfg, buckets, executor)

    monkeypatch.setattr(sbmod, "_decode_parse", spy)
    assert decompress_bytes(comp_v3) == data
    assert seen and all(seen)
    seen.clear()
    assert decompress_bytes(comp_v4) == data
    assert seen and not any(seen)


def test_auto_substream_resolves_for_long_reads():
    """Default config at 1000 bp shrinks G toward ~8192 walk steps (the
    footer records the resolved value; decode follows it), while
    auto_substream=False pins the configured G."""
    from phyngsc_tpu.container import footer as footermod

    data = _longread_fastq(64, 1000, seed=3)
    comp = compress_bytes(data, CodecConfig(), 1)
    foot = footermod.read_footer(comp)
    assert foot.records_per_substream == 8
    assert decompress_bytes(comp) == data

    comp2 = compress_bytes(data, CodecConfig(auto_substream=False), 1)
    assert footermod.read_footer(comp2).records_per_substream == 64
    assert decompress_bytes(comp2) == data

    # short reads are untouched
    short = synthesize_fastq(300, read_len=36, seed=4)
    comp3 = compress_bytes(short, CodecConfig(), 1)
    assert footermod.read_footer(comp3).records_per_substream == 64
