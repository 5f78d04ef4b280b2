"""Bit packing of unsigned residuals in 8-sample blocks.

Semantics follow the reference's block format (reference:
communicate/method.tex §Bit Packing, cpp/Compress/sprintz_delta.cpp:64-381,
python/compress.py:224-362): per block of 8 samples compute the max number
of bits any value needs, promote width w-1 to w (so e.g. 7→8 for uint8,
15→16 for uint16 — saves a header code point), and pack each value with
exactly that many little-endian bits.

Implementation is our own: *width-grouped* vectorized packing — all blocks
sharing a bitwidth are packed/unpacked in one numpy shot (np.unpackbits /
np.packbits, bitorder='little'), so encode and decode cost O(#distinct
widths) numpy calls regardless of series length. Zero-width blocks touch no
payload bytes at all, which is what makes runs of constants nearly free
(the RLE fast path, reference: cpp/Compress/sprintz_delta_rle.cpp:214-260).
"""

from __future__ import annotations

import numpy as np

BLOCK = 8  # samples per block (reference: sprintz_delta_rle.cpp:63)

_UNSIGNED = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def bit_length(m: np.ndarray) -> np.ndarray:
    """Exact per-element bit length (position of highest set bit) for any
    unsigned integer array — no float log2, exact even for uint64."""
    m = m.astype(np.uint64, copy=True)
    n = np.zeros(m.shape, np.uint8)
    for shift in (32, 16, 8, 4, 2, 1):
        big = m >= (np.uint64(1) << np.uint64(shift))
        n[big] += np.uint8(shift)
        m[big] >>= np.uint64(shift)
    n += (m > 0).astype(np.uint8)
    return n


def pad_to_block(u: np.ndarray, block: int = BLOCK) -> np.ndarray:
    """Zero-pad to a multiple of ``block`` samples."""
    n = len(u)
    rem = (-n) % block
    if rem == 0:
        return u
    return np.concatenate([u, np.zeros(rem, dtype=u.dtype)])


def block_nbits(u: np.ndarray, block: int = BLOCK) -> np.ndarray:
    """Per-block bitwidth with the reference's (w-1)->w promotion."""
    w = u.dtype.itemsize * 8
    ored = np.bitwise_or.reduce(u.reshape(-1, block), axis=1)
    nb = bit_length(ored)
    nb[nb == w - 1] = w  # promotion: header can't express w-1 and w distinctly
    return nb


def pack_blocks(u: np.ndarray, nbits: np.ndarray, block: int = BLOCK) -> bytes:
    """Pack padded unsigned samples using per-block widths ``nbits``.

    Payload layout: blocks in order; block b contributes exactly
    ``nbits[b] * block / 8`` bytes (block=8 → nbits[b] bytes per value-byte
    of width). Width-grouped vectorized implementation.
    """
    itemsize = u.dtype.itemsize
    blocks = u.reshape(-1, block)
    nbits = nbits.astype(np.int64)
    bytes_per_block = nbits * block // 8
    offsets = np.concatenate([[0], np.cumsum(bytes_per_block)])
    payload = np.zeros(int(offsets[-1]), dtype=np.uint8)
    for b in np.unique(nbits):
        b = int(b)
        if b == 0:
            continue
        idx = np.flatnonzero(nbits == b)
        vals = blocks[idx]  # (k, block)
        nbytes = b * block // 8
        if b <= 16 and block == 8 and len(idx) >= 2048:
            # shift-scatter: sample j's b bits land in <= 3 bytes starting
            # at byte j*b>>3; OR lanes serially over j (they may share a
            # boundary byte) — no 8x bit-matrix expansion. Gated on group
            # size: ~24 numpy calls of setup lose to unpackbits below ~2k
            # blocks (measured 0.36x at 200 blocks, 1.35-1.39x above 20k)
            k = len(idx)
            acc = np.zeros((k, nbytes + 2), dtype=np.uint8)
            for j in range(block):
                o = j * b
                byte0 = o >> 3
                v32 = vals[:, j].astype(np.uint32) << np.uint32(o & 7)
                acc[:, byte0] |= (v32 & np.uint32(0xFF)).astype(np.uint8)
                acc[:, byte0 + 1] |= ((v32 >> np.uint32(8)) & np.uint32(0xFF)).astype(np.uint8)
                acc[:, byte0 + 2] |= (v32 >> np.uint32(16)).astype(np.uint8)
            dst = offsets[idx][:, None] + np.arange(nbytes)
            payload[dst] = acc[:, :nbytes]
            continue
        if b <= 32 and block == 8 and len(idx) >= 2048:
            # 17-32-bit variant: sample j's bits span <= 5 bytes; shifted
            # u64 lane OR-merged byte-wise (same gating rationale)
            k = len(idx)
            acc = np.zeros((k, nbytes + 4), dtype=np.uint8)
            for j in range(block):
                o = j * b
                byte0 = o >> 3
                v64 = vals[:, j].astype(np.uint64) << np.uint64(o & 7)
                for byte_k in range(5):
                    acc[:, byte0 + byte_k] |= (
                        (v64 >> np.uint64(8 * byte_k)) & np.uint64(0xFF)
                    ).astype(np.uint8)
            dst = offsets[idx][:, None] + np.arange(nbytes)
            payload[dst] = acc[:, :nbytes]
            continue
        # little-endian byte view -> little-endian bit matrix -> first b bits
        byte_view = vals.reshape(-1, 1).view(np.uint8).reshape(len(idx), block, itemsize)
        bits = np.unpackbits(byte_view, axis=2, bitorder="little", count=b)
        packed = np.packbits(bits.reshape(len(idx), block * b), axis=1, bitorder="little")
        dst = offsets[idx][:, None] + np.arange(nbytes)
        payload[dst] = packed
    return payload.tobytes()


def unpack_blocks(
    payload: bytes, nbits: np.ndarray, dtype: np.dtype, block: int = BLOCK
) -> np.ndarray:
    """Inverse of pack_blocks: returns the padded unsigned sample array.

    Widths <= 16 take a shift-gather path: sample j of a b-bit block spans
    bits [j*b, (j+1)*b), i.e. at most 3 bytes — one u32 gather + shift +
    mask per sample lane, no 8x bit-matrix expansion (measured ~3x faster
    than the unpackbits route on typical residual widths)."""
    dtype = np.dtype(dtype)
    itemsize = dtype.itemsize
    nbits = nbits.astype(np.int64)
    nblocks = len(nbits)
    buf = np.frombuffer(payload, dtype=np.uint8)
    bytes_per_block = nbits * block // 8
    offsets = np.concatenate([[0], np.cumsum(bytes_per_block)])
    out = np.zeros((nblocks, block), dtype=_UNSIGNED[itemsize])
    for b in np.unique(nbits):
        b = int(b)
        if b == 0:
            continue
        idx = np.flatnonzero(nbits == b)
        nbytes = b * block // 8
        src = offsets[idx][:, None] + np.arange(nbytes)
        packed = buf[src]  # (k, nbytes)
        if b <= 16 and block == 8:
            k = len(idx)
            pad = np.zeros((k, nbytes + 2), dtype=np.uint8)
            pad[:, :nbytes] = packed
            mask = np.uint32((1 << b) - 1)
            vals8 = np.empty((k, block), dtype=np.uint32)
            for j in range(block):
                o = j * b
                byte0 = o >> 3
                sh = np.uint32(o & 7)
                w32 = (
                    pad[:, byte0].astype(np.uint32)
                    | (pad[:, byte0 + 1].astype(np.uint32) << np.uint32(8))
                    | (pad[:, byte0 + 2].astype(np.uint32) << np.uint32(16))
                )
                vals8[:, j] = (w32 >> sh) & mask
            out[idx] = vals8.astype(_UNSIGNED[itemsize])
            continue
        if b <= 32 and block == 8 and itemsize >= 4:
            # same shift-gather idea with a 5-byte little-endian window in
            # u64 (b+7 <= 39 bits): one gather + shifts per sample lane
            # instead of the 8x(w-bit) matrix expansion below — the
            # 17-32-bit residual range is the timestamp-delta hot path
            # (r10: ts decode was the single biggest decode_batch term)
            k = len(idx)
            pad = np.zeros((k, nbytes + 4), dtype=np.uint8)
            pad[:, :nbytes] = packed
            mask64 = np.uint64((1 << b) - 1)
            vals8 = np.empty((k, block), dtype=np.uint64)
            for j in range(block):
                o = j * b
                byte0 = o >> 3
                sh = np.uint64(o & 7)
                w64 = (
                    pad[:, byte0].astype(np.uint64)
                    | (pad[:, byte0 + 1].astype(np.uint64) << np.uint64(8))
                    | (pad[:, byte0 + 2].astype(np.uint64) << np.uint64(16))
                    | (pad[:, byte0 + 3].astype(np.uint64) << np.uint64(24))
                    | (pad[:, byte0 + 4].astype(np.uint64) << np.uint64(32))
                )
                vals8[:, j] = (w64 >> sh) & mask64
            out[idx] = vals8.astype(_UNSIGNED[itemsize])
            continue
        bits = np.unpackbits(packed, axis=1, bitorder="little", count=block * b)
        bits = bits.reshape(len(idx), block, b)
        full = np.zeros((len(idx), block, itemsize * 8), dtype=np.uint8)
        full[:, :, :b] = bits
        vals = np.packbits(full.reshape(-1, itemsize * 8), axis=1, bitorder="little")
        out[idx] = vals.view(_UNSIGNED[itemsize]).reshape(len(idx), block)
    return out.reshape(-1)
