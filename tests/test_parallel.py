import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.models import quality
from phyngsc_tpu.parallel import offsets as offs
from phyngsc_tpu.parallel.mesh import make_mesh, sharded_analyze, sharded_quality_encode
from phyngsc_tpu.parallel.partition import partition_regions, split_subblocks
from phyngsc_tpu.utils.fastq import index_records, synthesize_fastq

CFG = CodecConfig(records_per_substream=8)


def test_partition_covers_input_exactly():
    data = synthesize_fastq(500, read_len=36, seed=0)
    buf = np.frombuffer(data, np.uint8)
    regions = partition_regions(buf, 4, CFG)
    assert regions[0].start == 0
    assert regions[-1].end == len(data)
    for a, b in zip(regions, regions[1:]):
        assert a.end == b.start
    # each region boundary is a record start
    idx = index_records(buf)
    starts = set(int(s) for s in idx.title_start) | {len(data)}
    for r in regions[1:]:
        assert r.start in starts


def test_split_subblocks_bounds():
    sizes = np.full(1000, 121, np.int64)
    cfg = CodecConfig(subblock_input_bytes=12100, max_records_per_subblock=64)
    sls = split_subblocks(sizes, cfg)
    assert sls[0] == slice(0, 64)  # record cap binds first
    total = sum(s.stop - s.start for s in sls)
    assert total == 1000


def test_offsets_from_counts():
    starts, cbo = offs.offsets_from_counts([[100, 100, 50], [], [200, 30]])
    assert starts == [0, 250, 250]
    assert cbo == [0, 0, 0, 2, 2]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_exchange_offsets_sharded():
    mesh = make_mesh(8, 1)
    fn = offs.exchange_offsets_sharded(mesh, CFG.data_axis)
    local = jnp.arange(8 * 3, dtype=jnp.int32).reshape(8, 3)  # 3 blocks/device
    start, all_sizes = fn(local)
    start = np.asarray(start)
    all_sizes = np.asarray(all_sizes)
    np.testing.assert_array_equal(all_sizes, np.arange(24).reshape(8, 3))
    want = np.concatenate([[0], np.cumsum(all_sizes.sum(1))[:-1]])
    np.testing.assert_array_equal(start, want)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_analyze_matches_single_device():
    rng = np.random.default_rng(1)
    R, L = 64, 16
    qual = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    lens = np.full(R, L, np.int32)
    valid = np.ones((R, L), bool)
    mesh = make_mesh(4, 2)
    fn = sharded_analyze(mesh)
    got = np.asarray(fn(jnp.array(qual), jnp.array(valid)))
    from phyngsc_tpu.ops.histogram import position_histogram

    want = np.asarray(position_histogram(jnp.array(qual), jnp.array(valid), 256))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_encode_decodes_back():
    rng = np.random.default_rng(2)
    R, L, G = 64, 12, 8
    n_data = 4
    qual = rng.integers(33, 60, size=(R, L)).astype(np.uint8)
    lens = np.full(R, L, np.int32)
    counts = quality.analyze(jnp.array(qual), jnp.array(lens))
    tables = quality.build_tables(np.asarray(counts), CFG)
    cap = (R // n_data) * L
    mesh = make_mesh(n_data, 2)
    fn = sharded_quality_encode(mesh, G, cap)
    words, sub_n_words, totals = fn(
        jnp.array(qual), jnp.array(lens),
        jnp.array(tables.codes), jnp.array(tables.lens),
    )
    words = np.asarray(words).reshape(n_data, cap)
    totals = np.asarray(totals)
    sub_n_words = np.asarray(sub_n_words)
    # concatenate shard words (trim cap slack) → single container stream
    stream = np.concatenate([words[d, : totals[d]] for d in range(n_data)])
    got = quality.decode_device(
        jnp.array(stream), jnp.array(sub_n_words), jnp.array(lens),
        jnp.array(tables.luts(CFG.max_code_len)), L, G, CFG.max_code_len,
    )
    np.testing.assert_array_equal(np.asarray(got), qual)


def test_bucket_ctx_promotes_tails():
    from phyngsc_tpu.utils.shapes import BucketCtx, bucket_records

    ctx = BucketCtx()
    assert ctx.pick(65536, 64) == 65536
    # tail promotes into the in-use bucket instead of minting 4096
    assert ctx.pick(2318, 64) == 65536
    # far-below-cap sizes keep their natural bucket (promotion bounded 16x)
    assert ctx.pick(700, 64) == bucket_records(700, 64)
    # fresh context: no cross-run leakage
    assert BucketCtx().pick(2318, 64) == bucket_records(2318, 64)


def test_bucket_ctx_word_caps():
    from phyngsc_tpu.utils.shapes import BucketCtx

    ctx = BucketCtx()
    big = 28 * (1 << 14)
    assert ctx.pick_words("q", big) == big
    # small tail cap promotes to the in-use cap (within the absolute bound)
    assert ctx.pick_words("q", 1 << 14) == big
    # kinds are independent: dna's small cap must not see quality's big one
    assert ctx.pick_words("d", 1 << 14) == 1 << 14
    # beyond the absolute bound: keep natural
    huge = big + BucketCtx.MAX_PROMOTE_WORDS + (1 << 14)
    ctx2 = BucketCtx()
    assert ctx2.pick_words("q", huge) == huge
    assert ctx2.pick_words("q", 1 << 14) == 1 << 14
