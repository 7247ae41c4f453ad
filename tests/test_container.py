import numpy as np
import pytest

from phyngsc_tpu.container import block as blockmod
from phyngsc_tpu.container import footer as footermod


def collect(blocks):
    return list(blockmod.iter_subblocks((b.writer_id, b.payload) for b in blocks))


def test_pack_parse_single_block():
    subs = [b"alpha" * 10, b"beta" * 5, b"x"]
    blocks = blockmod.pack_blocks(3, subs, block_size=4096)
    assert len(blocks) == 1
    assert len(blocks[0].payload) < 4096  # last block short
    got = collect(blocks)
    assert got == [(3, s) for s in subs]


def test_split_subblock_across_blocks():
    rng = np.random.default_rng(0)
    subs = [rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
            for n in [1000, 3000, 500, 2500]]
    blocks = blockmod.pack_blocks(1, subs, block_size=1024)
    # all but last exactly block_size
    for b in blocks[:-1]:
        assert len(b.payload) == 1024
    got = collect(blocks)
    assert got == [(1, s) for s in subs]


def test_subblock_larger_than_block():
    big = bytes(range(256)) * 40  # 10240 bytes, block 1024 → spans many blocks
    blocks = blockmod.pack_blocks(0, [big, b"tail"], block_size=1024)
    got = collect(blocks)
    assert got == [(0, big), (0, b"tail")]


def test_interleaved_writers_stitch_independently():
    b1 = blockmod.pack_blocks(0, [b"A" * 1500], block_size=1024)
    b2 = blockmod.pack_blocks(1, [b"B" * 1500], block_size=1024)
    # interleave file order: w0[0], w1[0], w0[1], w1[1]
    order = [b1[0], b2[0], b1[1], b2[1]]
    got = collect(order)
    assert sorted(got) == [(0, b"A" * 1500), (1, b"B" * 1500)]


def test_empty_writer_emits_empty_block():
    blocks = blockmod.pack_blocks(2, [], block_size=1024)
    assert len(blocks) == 1
    assert collect(blocks) == []


def test_footer_roundtrip():
    f = footermod.Footer(
        fastq_size=123456789012,
        block_size=8 << 20,
        n_writers=3,
        overlaps=[0, 117, 64],
        writer_block_counts=[4, 2, 3],
        last_block_sizes=[100, 200, 300],
        cbo=[0, 0, 1, 2, 0, 2, 1, 2, 0],
        records_per_substream=64,
        max_code_len=12,
    )
    blob = footermod.write_footer(f)
    g = footermod.read_footer(b"JUNKPREFIX" + blob)
    assert g == f
    sizes = g.block_sizes_in_file_order()
    assert len(sizes) == 9
    assert sizes[-1] == 100  # writer 0's last block
    assert sizes.count(8 << 20) == 6


def test_footer_bad_magic():
    with pytest.raises(ValueError):
        footermod.read_footer(b"\x00" * 64)
