"""Canonical Huffman entropy coder over bytes — the reference's entropy
stage done for real (the sprintz paper applies Huffman after bit-packing;
the repo's C++ ships it only in the paper experiments, so round 2 used a
zlib analog 'W'; this module closes that gap with an actual canonical
Huffman code).

Design (all public-knowledge: canonical Huffman per DEFLATE RFC 1951 §3.2.2
code construction):

* encode: byte histogram -> Huffman tree (heapq) -> code LENGTHS only ->
  canonical codes assigned in (length, symbol) order. Bit-packing is
  vectorized byte-wise: each code (<=15 bits at a <=7-bit phase) is
  left-aligned in a 24-bit window spanning exactly 3 output bytes, and
  each byte lane is OR-merged with np.bitwise_or.reduceat (indices within
  a lane are sorted because symbol start offsets are increasing).
* decode: table-driven canonical decode, vectorized ACROSS sub-blocks:
  the stream is cut into independent sub-blocks at encode time (bit
  offsets in the header), so decode advances one symbol per iteration in
  EVERY sub-block at once (numpy gathers + one 2^maxlen lookup table).
  Work is O(n) with numpy ops of width n_blocks — the same
  "independent blocks make entropy decode parallel" observation the
  reference's block format is built on.
* max code length is capped at 15 by flattening the histogram (repeated
  sqrt) until the tree fits — the standard depth-limiting heuristic —
  so the decode table is at most 2^15 entries.

Container: 'HUF1' magic | u32 n_symbols | u16 block_syms | 128 B nibble-
packed code lengths | u32 n_blocks | varint bit-offset deltas | payload.

The sub-block size adapts per blob (power of two, 64..4096, targeting
~512 blocks): decode's vectorized loop runs block_syms iterations over
n_blocks-wide gathers, so small blobs must not pay a fixed 4096
iterations of numpy-call overhead, while huge blobs keep wide lanes.
"""

from __future__ import annotations

import heapq

import numpy as np

MAGIC = b"HUF1"
MAX_LEN = 15
BLOCK_SYMS = 4096  # max symbols per independently-decodable sub-block
MIN_BLOCK_SYMS = 64
TARGET_BLOCKS = 512


def _block_syms(n: int) -> int:
    """Power-of-two sub-block size in [MIN_BLOCK_SYMS, BLOCK_SYMS]."""
    if n <= 0:
        return MIN_BLOCK_SYMS
    bs = 1 << max(0, (n // TARGET_BLOCKS)).bit_length()
    return max(MIN_BLOCK_SYMS, min(BLOCK_SYMS, bs))


def _code_lengths(counts: np.ndarray) -> np.ndarray:
    """Huffman code lengths per symbol (0 = unused), depth-capped at
    MAX_LEN by histogram flattening."""
    counts = counts.astype(np.float64)
    while True:
        heap: list = []
        tick = 0
        for s in np.flatnonzero(counts):
            heap.append((float(counts[s]), tick, int(s), None, None))
            tick += 1
        if not heap:
            return np.zeros(256, np.uint8)
        if len(heap) == 1:
            out = np.zeros(256, np.uint8)
            out[heap[0][2]] = 1
            return out
        heapq.heapify(heap)
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            heapq.heappush(heap, (a[0] + b[0], tick, -1, a, b))
            tick += 1
        lens = np.zeros(256, np.uint8)

        def walk(node, depth):
            if node[2] >= 0:
                lens[node[2]] = max(depth, 1)
                return
            walk(node[3], depth + 1)
            walk(node[4], depth + 1)

        walk(heap[0], 0)
        if lens.max() <= MAX_LEN:
            return lens
        # flatten the histogram and retry (standard depth-limit heuristic)
        counts = np.where(counts > 0, np.ceil(np.sqrt(counts)), 0.0)


def _canonical_codes(lens: np.ndarray) -> np.ndarray:
    """Canonical code per symbol from lengths (RFC 1951 construction)."""
    codes = np.zeros(256, np.uint32)
    code = 0
    bl_count = np.bincount(lens, minlength=MAX_LEN + 1)
    bl_count[0] = 0  # unused symbols must not advance the code (RFC 1951)
    next_code = np.zeros(MAX_LEN + 2, np.uint32)
    for l in range(1, MAX_LEN + 1):
        code = (code + int(bl_count[l - 1])) << 1
        next_code[l] = code
    order = np.lexsort((np.arange(256), lens))
    for s in order:
        if lens[s]:
            codes[s] = next_code[lens[s]]
            next_code[lens[s]] += 1
    return codes


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _read_uvarint(buf: memoryview, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, pos
        shift += 7


def huffman_encode(data) -> bytes:
    """bytes/uint8 array -> canonical-Huffman container."""
    x = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else np.ascontiguousarray(data, np.uint8)
    n = len(x)
    lens_tbl = _code_lengths(np.bincount(x, minlength=256)) if n else np.zeros(256, np.uint8)
    codes_tbl = _canonical_codes(lens_tbl)
    sym_lens = lens_tbl[x].astype(np.int64)
    sym_codes = codes_tbl[x]
    bs = _block_syms(n)
    # sub-block bit offsets (every bs symbols)
    ends = np.cumsum(sym_lens)
    total_bits = int(ends[-1]) if n else 0
    starts_bits = ends - sym_lens  # per-symbol start bit
    blk_starts = starts_bits[::bs] if n else np.zeros(0, np.int64)
    # vectorized pack, byte-lane OR-merge: left-align each code in a
    # 24-bit window at byte (start>>3); window bits outside the code are
    # zero, so overlapping windows combine by OR
    n_payload = (total_bits + 7) >> 3
    out = np.zeros(n_payload + 2, np.uint8)  # +2: last window may overrun
    if n:
        shift = (24 - sym_lens - (starts_bits & 7)).astype(np.uint32)
        win = sym_codes.astype(np.uint32) << shift
        base = starts_bits >> 3
        for k in range(3):
            lane = (win >> (16 - 8 * k)).astype(np.uint8)
            idx = base + k
            cut = np.empty(n, bool)
            cut[0] = True
            np.not_equal(idx[1:], idx[:-1], out=cut[1:])
            gpos = np.flatnonzero(cut)
            out[idx[gpos]] |= np.bitwise_or.reduceat(lane, gpos)
    payload = out[:n_payload].tobytes()
    nibbles = (lens_tbl[0::2] << 4) | lens_tbl[1::2]
    head = bytearray(MAGIC)
    head += np.uint32(n).tobytes()
    head += np.uint16(bs).tobytes()
    head += nibbles.astype(np.uint8).tobytes()  # 128 bytes of code lengths
    head += np.uint32(len(blk_starts)).tobytes()
    prev = 0
    for s in blk_starts:
        head += _uvarint(int(s) - prev)
        prev = int(s)
    return bytes(head) + payload


def _decode_table(lens_tbl: np.ndarray):
    """2^MAX_LEN lookup: window -> (symbol, code length)."""
    codes_tbl = _canonical_codes(lens_tbl)
    sym = np.zeros(1 << MAX_LEN, np.uint8)
    ln = np.zeros(1 << MAX_LEN, np.uint8)
    for s in range(256):
        l = int(lens_tbl[s])
        if not l:
            continue
        base = int(codes_tbl[s]) << (MAX_LEN - l)
        span = 1 << (MAX_LEN - l)
        sym[base : base + span] = s
        ln[base : base + span] = l
    return sym, ln


def huffman_decode(buf: bytes) -> np.ndarray:
    mv = memoryview(buf)
    assert bytes(mv[:4]) == MAGIC, "not a HUF1 container"
    n = int(np.frombuffer(mv[4:8], np.uint32)[0])
    bs = int(np.frombuffer(mv[8:10], np.uint16)[0])
    nib = np.frombuffer(mv[10:138], np.uint8)
    lens_tbl = np.empty(256, np.uint8)
    lens_tbl[0::2] = nib >> 4
    lens_tbl[1::2] = nib & 0x0F
    n_blocks = int(np.frombuffer(mv[138:142], np.uint32)[0])
    pos = 142
    blk_bits = np.zeros(n_blocks, np.int64)
    acc = 0
    for i in range(n_blocks):
        d, pos = _read_uvarint(mv, pos)
        acc += d
        blk_bits[i] = acc
    payload = np.frombuffer(mv[pos:], np.uint8)
    if not n:
        return np.zeros(0, np.uint8)
    sym_t, len_t = _decode_table(lens_tbl)
    # bit stream as one big-endian bit array for windowed gathers
    bits = np.unpackbits(payload)
    # pad so every 15-bit window gather stays in range
    bits = np.concatenate([bits, np.zeros(MAX_LEN + 64, np.uint8)])
    pow2 = (1 << np.arange(MAX_LEN - 1, -1, -1)).astype(np.int64)
    out = np.empty(n, np.uint8)
    cursors = blk_bits.copy()
    blk_lens = np.full(n_blocks, bs, np.int64)
    if n_blocks:
        blk_lens[-1] = n - bs * (n_blocks - 1)
    out_pos = np.arange(n_blocks, dtype=np.int64) * bs
    remaining = blk_lens.copy()
    active = remaining > 0
    # one symbol per active block per iteration — vectorized across blocks
    idx = np.arange(MAX_LEN, dtype=np.int64)
    while active.any():
        cur = cursors[active]
        win = bits[cur[:, None] + idx[None, :]].astype(np.int64) @ pow2
        s = sym_t[win]
        l = len_t[win].astype(np.int64)
        out[out_pos[active]] = s
        cursors[active] += l
        out_pos[active] += 1
        remaining[active] -= 1
        active = remaining > 0
    return out
