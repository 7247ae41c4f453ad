"""Writer for the reference phyNGSC ``.ngsc`` container format.

Completes the interop story (VERDICT r3 next #7): FASTQ → a container the
reference toolchain's format defines, verified by round-tripping through our
importer (container/ngsc_import.py) — which is itself proven byte-exact
against the compiled reference binary. Every structure mirrors a store-side
routine of the reference, cited inline:

    file    := blocks... footer footer_size:u16       (phyNGSC.cpp:910-1057)
    footer  := MakeFooter                             (tasks.cpp:1104-1176)
    block   := MakeHeader + payload, 8 MiB framing    (tasks.cpp:1179-1200,
               split sub-blocks flagged FSBS/LSBS      phyNGSC.cpp:843-903)
    subblk  := info | StoreTitle | StoreQuality | StoreDNA
               (copy order phyNGSC.cpp:804-840; info :719-742)

This is a host-side compatibility writer (pure numpy/bit I/O): the TPU
pipeline's native container is `.ngsct`; exporting exists to prove the
store-side semantics (C4-C12) are fully understood, not to be fast.

Deliberate choices within the format's freedom:
- Huffman trees are serialized as canonical-code SHAPES (pre-order blob,
  huffman.cpp:88-147 layout). Any valid prefix tree decodes — the reference
  reader derives codes from the stored shape — so we ship our optimal
  length-limited codes instead of replicating HuffmanEncoder's heap quirks.
- One writer rank (the format supports it; the measured baseline binary ran
  single-rank through native/mpi_shim, and the reference's >= 2-rank check
  is a driver restriction, phyNGSC.cpp:91-97, not a format one).
- FLAG_VARIABLE_LENGTH is always set, mirroring the reference's inverted
  min-length tracking that makes it effectively always-on (SURVEY quirk #1).
- No FLAG_USE_DELTA ever: the reference's SOLiD path destroys quality data
  while translating (phyNGSC.cpp:533-534) and is not byte-exact for ANY
  decoder; color-space input exports as plain symbols instead.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from phyngsc_tpu.container.ngsc_import import (
    AMB_CHAR, B_SIZE, BLOCK_BYTES, FLAG_CONST_NUM_FIELDS, FLAG_DNA_PLAIN,
    FLAG_VARIABLE_LENGTH, FSBS, LSBS, MAX_FIELD_STAT_LEN, MAX_NUM_VAL_HUF,
    _bit_length, _int_log2)
from phyngsc_tpu.ops import huffman
from phyngsc_tpu.utils.bitio import BitWriter
from phyngsc_tpu.utils.fastq import index_records

SEPARATORS = b" ._,=:/-#\n"      # phyNGSC.cpp:208

#: trans_amb_codes (phyNGSC.cpp:184-206): char -> ambiguity code
AMB_CODE: Dict[int, int] = {ch[0]: code for code, ch in AMB_CHAR.items()}
ACGT = frozenset(b"ACGT")


class NgscExportError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Huffman tree blob writer (inverse of ngsc_import.Tree.parse_blob)
# ---------------------------------------------------------------------------

def _blob_id_bits(n_symbols: int) -> int:
    """Leaf-id width the reader derives from the blob's n_symbols field
    (ngsc_import.Tree.parse_blob; utils.h int_log semantics)."""
    bits = _int_log2(n_symbols)
    if n_symbols & (n_symbols - 1):
        bits += 1
    return bits


class TreeWriter:
    """Prefix-code table + its reference-format blob.

    Built from symbol frequencies via exact package-merge lengths (cap 12,
    comfortably under the importer's 20-bit LUT); the canonical (len, sym)
    codes define a full binary tree whose pre-order shape is the blob."""

    def __init__(self, freqs: np.ndarray, n_symbols: int):
        freqs = np.asarray(freqs, dtype=np.int64)
        present = np.flatnonzero(freqs)
        if present.shape[0] <= 1:
            # zero-bit single leaf (or never-decoded dummy): "1" + id
            sym = int(present[0]) if present.shape[0] else 0
            self.lens = np.zeros(freqs.shape[0], np.uint8)
            self.codes = np.zeros(freqs.shape[0], np.uint32)
            self._single = sym
        else:
            self.lens = huffman.build_code_lengths(freqs, 12)
            self.codes = huffman.canonical_codes(self.lens)
            self._single = -1
        self.n_symbols = n_symbols

    def encode(self, bw: BitWriter, sym: int) -> None:
        if self._single < 0:
            bw.put_bits(int(self.codes[sym]), int(self.lens[sym]))

    def blob(self) -> bytes:
        mem = BitWriter()
        present = np.flatnonzero(self.lens)
        n_leaves = 1 if self._single >= 0 else present.shape[0]
        mem.put_uint(max(2 * n_leaves - 2, 0), 4)      # root id (advisory)
        mem.put_uint(self.n_symbols, 4)
        min_len = int(self.lens[present].min()) if present.size else 0
        mem.put_byte(min_len)
        id_bits = _blob_id_bits(self.n_symbols)
        if self._single >= 0:
            mem.put_bit(1)
            if id_bits:
                mem.put_bits(self._single, id_bits)
        else:
            leaf = {(int(self.lens[s]), int(self.codes[s])): int(s)
                    for s in present}
            # pre-order, left first — matches the reader's stack order
            stack: List[Tuple[int, int]] = [(0, 0)]
            while stack:
                code, ln = stack.pop()
                s = leaf.get((ln, code))
                if s is not None:
                    mem.put_bit(1)
                    if id_bits:
                        mem.put_bits(s, id_bits)
                else:
                    mem.put_bit(0)
                    stack.append(((code << 1) | 1, ln + 1))
                    stack.append((code << 1, ln + 1))
        mem.flush()
        return mem.getvalue()

    def store(self, bw: BitWriter) -> None:
        """HuffmanEncoder::StoreTree(BitStream&) framing (huffman.cpp:
        191-205): byte-align, u32 size, blob bytes."""
        bw.flush()
        blob = self.blob()
        bw.put_uint(len(blob), 4)
        bw.put_bytes(blob)


# ---------------------------------------------------------------------------
# Title stream (StoreTitle mirror, tasks.cpp:289-510)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _NumField:
    sep: int
    values: np.ndarray           # (R,) int64
    min_value: int = 0
    max_value: int = 0
    min_delta: int = 0
    max_delta: int = 1
    delta_coding: bool = False
    bits_per_num: int = 0
    bits_per_value: int = 0
    tree: Optional[TreeWriter] = None
    blk_const: Optional[np.ndarray] = None


@dataclasses.dataclass
class _CharField:
    sep: int
    values: List[bytes]
    constant: bool = False
    len_constant: bool = False
    flen: int = 0
    max_len: int = 0
    min_len: int = 0
    bits_per_len: int = 0
    data: bytes = b""
    ham: Optional[np.ndarray] = None
    trees: Optional[list] = None
    blk_const: Optional[np.ndarray] = None


def _split_title(line: bytes) -> List[Tuple[bytes, int]]:
    """Field list [(content, separator)] — content between separator chars
    of phyNGSC.cpp:208; the trailing '\\n' terminates the last field."""
    out = []
    start = 0
    for i, ch in enumerate(line):
        if ch in SEPARATORS:
            out.append((line[start:i], ch))
            start = i + 1
    if start != len(line):
        raise NgscExportError("title line does not end in a separator")
    return out


def _is_numeric(vals: List[bytes]) -> bool:
    """Numeric per the reference's to_num/to_string round trip: pure digits,
    no leading zeros (except '0'), fits uint32 — anything else would not
    re-emit byte-identically through b'%d'."""
    for v in vals:
        if not v or not v.isdigit():
            return False
        if v[0] == 0x30 and len(v) > 1:
            return False
        if int(v) > 0xFFFFFFFF:
            return False
    return True


def _analyze_title_fields(titles: List[bytes]):
    split0 = _split_title(titles[0])
    n_fields = len(split0)
    cols: List[List[bytes]] = [[] for _ in range(n_fields)]
    seps = [s for _, s in split0]
    for t in titles:
        sp = _split_title(t)
        if len(sp) != n_fields or [s for _, s in sp] != seps:
            raise NgscExportError(
                "variable title field schema (the reference flags "
                "FLAG_CONST_NUM_FIELDS off; importer refuses such files)")
        for i, (content, _) in enumerate(sp):
            cols[i].append(content)

    R = len(titles)
    n_blocks = (R + B_SIZE - 1) // B_SIZE
    fields: list = []
    for i in range(n_fields):
        vals = cols[i]
        if all(v == vals[0] for v in vals):
            fields.append(_CharField(sep=seps[i], values=vals, constant=True,
                                     data=vals[0]))
            continue
        if _is_numeric(vals):
            v = np.array([int(x) for x in vals], np.int64)
            f = _NumField(sep=seps[i], values=v)
            f.min_value = int(v.min())
            f.max_value = int(v.max())
            if R > 1:
                d = np.diff(v)
                f.min_delta = int(d.min())
                f.max_delta = int(d.max())
            v_diff = f.max_value - f.min_value
            d_diff = f.max_delta - f.min_delta
            f.delta_coding = not (v_diff < d_diff)
            f.bits_per_num = _bit_length(min(v_diff, d_diff))
            f.bits_per_value = _bit_length(v_diff)
            # per-32-record-block constancy (FetchTitleBody semantics)
            blk = np.zeros(n_blocks, bool)
            for b in range(n_blocks):
                lo, hi = b * B_SIZE, min((b + 1) * B_SIZE, R)
                w = v[lo:hi]
                if f.delta_coding:
                    blk[b] = bool(np.all(np.diff(w) == f.min_delta))
                else:
                    blk[b] = bool(np.all(w == w[0]))
            f.blk_const = blk
            # tree iff the store side writes one (range fits 512)
            diff = min(v_diff, d_diff)
            if diff + 1 <= MAX_NUM_VAL_HUF:
                freqs = np.zeros(diff + 1, np.int64)
                base = f.min_delta if f.delta_coding else f.min_value
                for b in range(n_blocks):
                    if blk[b]:
                        continue
                    lo, hi = b * B_SIZE, min((b + 1) * B_SIZE, R)
                    for r in range(lo + 1, hi):
                        nv = (int(v[r] - v[r - 1]) - base if f.delta_coding
                              else int(v[r]) - base)
                        freqs[nv] += 1
                f.tree = TreeWriter(freqs, diff + 1)
            fields.append(f)
            continue
        # char field
        f = _CharField(sep=seps[i], values=vals)
        lens = np.array([len(x) for x in vals], np.int64)
        f.flen = len(vals[0])
        f.max_len = int(lens.max())
        f.min_len = int(lens.min())
        f.len_constant = f.max_len == f.min_len
        f.bits_per_len = _bit_length(f.max_len - f.min_len)
        f.data = vals[0]
        ham = np.ones(f.flen, bool)
        for x in vals[1:]:
            k = min(len(x), f.flen)
            eq = np.frombuffer(x[:k], np.uint8) == \
                np.frombuffer(vals[0][:k], np.uint8)
            ham[:k] &= eq
        f.ham = ham
        blk = np.zeros(n_blocks, bool)
        for b in range(n_blocks):
            lo, hi = b * B_SIZE, min((b + 1) * B_SIZE, R)
            blk[b] = all(x == vals[lo] for x in vals[lo:hi])
        f.blk_const = blk
        # per-position trees over exactly the emitted symbols
        n_pos = min(f.max_len, MAX_FIELD_STAT_LEN)
        freqs = np.zeros((MAX_FIELD_STAT_LEN + 1, 256), np.int64)
        for b in range(n_blocks):
            lo, hi = b * B_SIZE, min((b + 1) * B_SIZE, R)
            emitted = [lo] if blk[b] else range(lo, hi)
            for r in emitted:
                x = vals[r]
                for k, ch in enumerate(x):
                    if k < f.flen and ham[k]:
                        continue
                    freqs[min(k, MAX_FIELD_STAT_LEN)][ch] += 1
        f.trees = [None] * (MAX_FIELD_STAT_LEN + 1)
        for j in range(n_pos):
            if j >= f.flen or not ham[j]:
                f.trees[j] = TreeWriter(freqs[j], 256)
        if f.max_len >= MAX_FIELD_STAT_LEN:
            f.trees[MAX_FIELD_STAT_LEN] = TreeWriter(
                freqs[MAX_FIELD_STAT_LEN], 256)
        fields.append(f)
    return fields


def _u32(x: int) -> int:
    return x & 0xFFFFFFFF


def _store_title(bw: BitWriter, fields, R: int) -> None:
    bw.put_uint(len(fields), 4)
    for f in fields:
        bw.put_byte(f.sep)
        if isinstance(f, _CharField) and f.constant:
            bw.put_byte(1)
            bw.put_uint(len(f.data), 4)
            bw.put_bytes(f.data)
            continue
        bw.put_byte(0)
        if isinstance(f, _NumField):
            bw.put_byte(1)
            bw.put_uint(_u32(f.min_value), 4)
            bw.put_uint(_u32(f.max_value), 4)
            bw.put_uint(_u32(f.min_delta), 4)
            bw.put_uint(_u32(f.max_delta), 4)
            if f.tree is not None:
                f.tree.store(bw)
                bw.flush()
            continue
        bw.put_byte(0)
        bw.put_byte(1 if f.len_constant else 0)
        bw.put_uint(f.flen, 4)
        bw.put_uint(f.max_len, 4)
        bw.put_uint(f.min_len, 4)
        bw.put_bytes(f.data)
        for k in range(f.flen):
            bw.put_bit(1 if f.ham[k] else 0)
        n_pos = min(f.max_len, MAX_FIELD_STAT_LEN)
        for j in range(n_pos):
            if j >= f.flen or not f.ham[j]:
                f.trees[j].store(bw)
        if f.max_len >= MAX_FIELD_STAT_LEN:
            f.trees[MAX_FIELD_STAT_LEN].store(bw)
        bw.flush()

    # body (FetchTitleBody inverse): per 32-record block — flags then records
    n_blocks = (R + B_SIZE - 1) // B_SIZE
    for b in range(n_blocks):
        lo, hi = b * B_SIZE, min((b + 1) * B_SIZE, R)
        for f in fields:
            if isinstance(f, _CharField) and f.constant:
                continue
            bw.put_bit(1 if f.blk_const[b] else 0)
        for r in range(lo, hi):
            for f in fields:
                if isinstance(f, _CharField) and f.constant:
                    continue
                if isinstance(f, _NumField):
                    if r % B_SIZE == 0:
                        if f.bits_per_value:
                            bw.put_bits(int(f.values[r]) - f.min_value,
                                        f.bits_per_value)
                    elif not f.blk_const[b]:
                        if f.bits_per_num > 0:
                            nv = (int(f.values[r] - f.values[r - 1])
                                  - f.min_delta if f.delta_coding
                                  else int(f.values[r]) - f.min_value)
                            if f.tree is not None:
                                f.tree.encode(bw, nv)
                            else:
                                bw.put_bits(nv, f.bits_per_num)
                    continue
                if r % B_SIZE > 0 and f.blk_const[b]:
                    continue
                x = f.values[r]
                if not f.len_constant and f.bits_per_len:
                    bw.put_bits(len(x) - f.min_len, f.bits_per_len)
                for k, ch in enumerate(x):
                    if k < f.flen and f.ham[k]:
                        continue
                    f.trees[min(k, MAX_FIELD_STAT_LEN)].encode(bw, ch)
        bw.flush()                      # per-block byte alignment


# ---------------------------------------------------------------------------
# Sub-block encode (info | title | quality | dna)
# ---------------------------------------------------------------------------

def _transfer(seq: bytes, qual: bytes):
    """Ambiguity transfer (phyNGSC.cpp:552-588): per-record, move IUPAC
    symbols into the quality byte when every covering quality is in
    [33, 40] and no unknown symbols exist."""
    codes = [AMB_CODE.get(c, 0) for c in seq]
    has_amb = any(c >= 2 for c in codes)
    if not has_amb:
        return seq, qual
    possible = all(c != 0 for c in codes) and all(
        33 <= q <= 40 for c, q in zip(codes, qual) if c >= 2)
    if not possible:
        return seq, qual
    s = bytearray()
    q = bytearray()
    for ch, c, qq in zip(seq, codes, qual):
        if c >= 2:
            q.append(128 + (c << 3) - 16 + (qq - 33))
        else:
            s.append(ch)
            q.append(qq)
    return bytes(s), bytes(q)


def encode_subblock(titles: List[bytes], seqs: List[bytes],
                    quals: List[bytes]) -> bytes:
    R = len(titles)
    pairs = [_transfer(s, q) for s, q in zip(seqs, quals)]
    kept = [p[0] for p in pairs]
    tqual = [p[1] for p in pairs]

    qua_lens = [len(q) for q in tqual]
    max_qua_len = max(qua_lens) if R else 0
    max_seq_len = max((len(s) for s in kept), default=0)

    q_alpha = sorted({c for q in tqual for c in q})
    if len(q_alpha) > 255:
        raise NgscExportError("quality alphabet exceeds the format's u8")
    q_index = {c: k for k, c in enumerate(q_alpha)}
    d_alpha = sorted({c for s in kept for c in s})
    if not d_alpha:
        d_alpha = [ord("A")]
    if len(d_alpha) > 255:
        raise NgscExportError("DNA alphabet exceeds the format's u8")
    d_index = {c: k for k, c in enumerate(d_alpha)}
    dna_plain = len(d_alpha) <= 4

    flags = FLAG_CONST_NUM_FIELDS | FLAG_VARIABLE_LENGTH
    if dna_plain:
        flags |= FLAG_DNA_PLAIN

    bw = BitWriter()
    bw.put_uint(R, 4)
    bw.put_uint(max_qua_len, 4)
    bw.put_uint(max_seq_len, 4)
    bw.put_byte(len(d_alpha))
    bw.put_byte(0)                      # QUALITY_PLAIN
    bw.put_byte(len(q_alpha))
    bw.put_uint(flags, 4)
    bw.flush()
    if R == 0:
        return bw.getvalue()
    bits = _bit_length(max_qua_len)
    for n in qua_lens:
        bw.put_bits(n, bits)
    bw.flush()

    _store_title(bw, _analyze_title_fields(titles), R)

    # quality (StoreQuality mirror): alphabet, tree 0 = global, tree j+1 per
    # position, then per-record symbols
    bw.put_bytes(bytes(q_alpha))
    bw.flush()
    qfreq = np.zeros((max_qua_len + 1, len(q_alpha)), np.int64)
    for q in tqual:
        for j, c in enumerate(q):
            k = q_index[c]
            qfreq[0][k] += 1
            qfreq[j + 1][k] += 1
    qtrees = [TreeWriter(qfreq[j], len(q_alpha))
              for j in range(max_qua_len + 1)]
    for t in qtrees:
        t.store(bw)
    bw.flush()
    for q in tqual:
        for j, c in enumerate(q):
            qtrees[j + 1].encode(bw, q_index[c])
    bw.flush()

    # dna (StoreDNA mirror)
    bw.put_bytes(bytes(d_alpha))
    bw.flush()
    if not dna_plain:
        dfreq = np.zeros(len(d_alpha), np.int64)
        for s in kept:
            for c in s:
                dfreq[d_index[c]] += 1
        dtree = TreeWriter(dfreq, len(d_alpha))
        dtree.store(bw)
        bw.flush()
    for s in kept:
        if dna_plain:
            for c in s:
                bw.put_bits(d_index[c], 2)
        else:
            for c in s:
                dtree.encode(bw, d_index[c])
    bw.flush()
    return bw.getvalue()


# ---------------------------------------------------------------------------
# Block assembly (phyNGSC.cpp:843-928) + footer (MakeFooter)
# ---------------------------------------------------------------------------

def _header_bytes(sbol: List[int], bcss: int, n_ranks: int = 1) -> bytes:
    bw = BitWriter()
    bewr = 0 if n_ranks <= 1 else max(
        1, (n_ranks - 1).bit_length())
    if bewr:
        bw.put_bits(0, bewr)            # single writer: rank 0
    beso = max(_bit_length(max(sbol, default=1)), 1)
    # BHS (u12) depends on its own byte length — sizes below are stable
    # because beso/nosb are fixed first
    head_bits = bewr + 12 + 6 + 5 + 2 + beso * len(sbol)
    bhs = (head_bits + 7) // 8
    bw.put_bits(bhs, 12)
    bw.put_bits(len(sbol), 6)
    bw.put_bits(beso, 5)
    bw.put_bits(bcss, 2)
    for n in sbol:
        bw.put_bits(n, beso)
    bw.flush()
    out = bw.getvalue()
    assert len(out) == bhs
    return out


def _assemble_blocks(subblocks: List[bytes]) -> Tuple[List[bytes], int]:
    """8 MiB framing with FSBS/LSBS splits (phyNGSC.cpp:843-903): every
    block except the last targets exactly BLOCK_BYTES, header included.
    The importer walks blocks by their self-delimiting headers, so a rare
    header-width wobble (BESO shrinking after a split) merely yields a
    byte-short block, which is still valid."""
    blocks: List[bytes] = []
    queue = [(payload, False) for payload in subblocks]  # (bytes, continued)
    cur: List[Tuple[bytes, bool, bool]] = []             # (chunk, fsbs, lsbs)

    def flush() -> None:
        if not cur:
            return
        bcss = (FSBS if cur[0][1] else 0) | (LSBS if cur[-1][2] else 0)
        sbol = [len(c) for c, _, _ in cur]
        hdr = _header_bytes(sbol, bcss)
        blocks.append(hdr + b"".join(c for c, _, _ in cur))
        cur.clear()

    i = 0
    while i < len(queue):
        payload, continued = queue[i]
        sbol = [len(c) for c, _, _ in cur] + [len(payload)]
        hdr_len = len(_header_bytes(sbol, 0))
        used = sum(len(c) for c, _, _ in cur)
        room = BLOCK_BYTES - hdr_len - used
        if len(payload) <= room:
            if len(cur) < 62:
                cur.append((payload, continued, False))
                i += 1
                continue
            # chunk-count cap reached but the payload fits: flush and retry
            # it in a fresh block. Splitting here would emit a zero-length
            # FSBS continuation chunk — a container shape the reference
            # writer never produces (ADVICE r4).
            flush()
            continue
        # split to fill the block exactly; the header width depends on the
        # head size, so iterate to the fixed point
        for _ in range(4):
            head_n = max(room, 0)
            sbol = [len(c) for c, _, _ in cur] + ([head_n] if head_n else [])
            new_room = BLOCK_BYTES - len(_header_bytes(sbol, 0)) - used
            if new_room == room:
                break
            room = new_room
        head = payload[: max(room, 0)]
        rest = payload[max(room, 0):]
        if head:
            cur.append((head, continued, True))
            queue[i] = (rest, True)
        elif not cur:
            raise AssertionError("sub-block does not fit an empty block")
        flush()
    flush()
    return blocks, len(subblocks)


def _make_footer(fastq_size: int, n_blocks: int, n_subblocks: int,
                 last_block_size: int) -> bytes:
    bw = BitWriter()
    beps = max(_bit_length(1), 1)
    befs = max(_bit_length(fastq_size), 1)
    bebs = max(_bit_length(n_blocks), 1)
    bess = max(_bit_length(n_subblocks), 1)
    belb = max(_bit_length(last_block_size), 1)
    beov = 1
    bw.put_bits(beps, 4)
    bw.put_bits(befs, 6)
    bw.put_bits(bebs, 4)
    bw.put_bits(bess, 4)
    bw.put_bits(belb, 5)
    bw.put_bits(beov, 4)
    bw.put_bit(0)                       # LBES=0: explicit last-block sizes
    bw.put_bits(1, beps)                # one writer
    if befs > 32:
        bw.put_bits(fastq_size >> 32, befs - 32)
        bw.put_bits(fastq_size & 0xFFFFFFFF, 32)
    else:
        bw.put_bits(fastq_size, befs)
    bw.put_bits(n_blocks, bebs)
    bw.put_bits(n_subblocks, bess)
    # no overlaps (ranks 1..P-1), CBO entries are 0 bits wide for P=1
    bw.put_bits(last_block_size, belb)
    bw.flush()
    body = bw.getvalue()
    if len(body) > 0xFFFF:
        raise NgscExportError("footer exceeds the u16 size field")
    return body + len(body).to_bytes(2, "big")


def export_ngsc(fastq: bytes, records_per_subblock: int = 20000) -> bytes:
    """FASTQ bytes → reference-format .ngsc container (single writer)."""
    fastq = bytes(fastq)
    if not fastq:
        raise NgscExportError(
            "the reference format cannot represent an empty FASTQ "
            "(ps >= 1 and bs >= 1 are structural)")
    buf = np.frombuffer(fastq, np.uint8)
    idx = index_records(buf)
    R = idx.n_records

    subblocks: List[bytes] = []
    for lo in range(0, R, records_per_subblock):
        hi = min(lo + records_per_subblock, R)
        titles = [fastq[int(idx.title_start[r]) : int(idx.title_end[r])]
                  + b"\n" for r in range(lo, hi)]  # trailing sep included
        seqs = [fastq[int(idx.seq_start[r]) : int(idx.seq_start[r])
                      + int(idx.seq_len[r])] for r in range(lo, hi)]
        quals = [fastq[int(idx.qual_start[r]) : int(idx.qual_start[r])
                       + int(idx.seq_len[r])] for r in range(lo, hi)]
        subblocks.append(encode_subblock(titles, seqs, quals))

    blocks, n_sub = _assemble_blocks(subblocks)
    out = b"".join(blocks)
    foot = _make_footer(len(fastq), len(blocks), n_sub, len(blocks[-1]))
    return out + foot


def export_ngsc_file(in_path: str, out_path: str,
                     records_per_subblock: int = 20000) -> int:
    with open(in_path, "rb") as f:
        data = f.read()
    out = export_ngsc(data, records_per_subblock)
    with open(out_path, "wb") as f:
        f.write(out)
    return len(out)
