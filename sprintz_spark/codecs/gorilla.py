"""Gorilla-style XOR compression for float64 columns.

Gorilla (Facebook's in-memory TSDB, VLDB'15 — public paper) XORs each
float's bit pattern with its predecessor and stores only the significant
window between the leading and trailing zero runs. This is a *target
addition* — the reference has no float codec (it quantizes floats instead,
reference: python/dfquantize2.py) — required by BASELINE.json's north_star.

We vectorize by hoisting the leading/trailing-zero window to *block*
granularity (8 values per block, same block size as the sprintz core):
per block store (trailing_zeros, sigbits) in a 2-byte header and bit-pack
each XOR value's significant window with the shared width. This trades a
few bits vs per-value windows for fully-vectorized numpy encode/decode
(width-grouped, like bitpack.py). Round trip is bit-exact for every
float64 including NaN/±inf/-0.0.
"""

from __future__ import annotations

import numpy as np

from sprintz_spark.codecs import bitpack

BLOCK = 8


def encode(x: np.ndarray) -> bytes:
    """float64 array -> bytes. Layout: u32 n | per-block headers
    (tz u8, sigbits u8) | width-grouped packed payload."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = len(x)
    u = x.view(np.uint64)
    xored = np.empty(n, dtype=np.uint64)
    if n:
        xored[0] = u[0]
        np.bitwise_xor(u[1:], u[:-1], out=xored[1:])
    padded = bitpack.pad_to_block(xored, BLOCK)
    blocks = padded.reshape(-1, BLOCK)
    ored = np.bitwise_or.reduce(blocks, axis=1)
    lead = 64 - bitpack.bit_length(ored).astype(np.int64)
    # trailing zeros of the OR: isolate lowest set bit, take its position
    low = ored & (np.uint64(0) - ored)
    tz = np.where(ored == 0, np.int64(64), bitpack.bit_length(low).astype(np.int64) - 1)
    sig = np.where(ored == 0, np.int64(0), 64 - lead - tz)
    shifted = blocks >> tz.astype(np.uint64)[:, None]
    payload = bitpack.pack_blocks(shifted.reshape(-1), sig, BLOCK)
    header = np.empty((len(blocks), 2), dtype=np.uint8)
    header[:, 0] = np.where(tz == 64, 0, tz)
    header[:, 1] = sig
    return (
        np.uint32(n).tobytes() + header.tobytes() + payload
    )


def decode(buf: bytes) -> np.ndarray:
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    nblocks = (n + BLOCK - 1) // BLOCK
    header = np.frombuffer(buf[4 : 4 + 2 * nblocks], dtype=np.uint8).reshape(-1, 2)
    tz = header[:, 0].astype(np.uint64)
    sig = header[:, 1].astype(np.int64)
    payload = buf[4 + 2 * nblocks :]
    shifted = bitpack.unpack_blocks(payload, sig, np.uint64, BLOCK)
    xored = (shifted.reshape(-1, BLOCK) << tz[:, None]).reshape(-1)[: max(n, 0)]
    vals = np.bitwise_xor.accumulate(xored)
    return vals.view(np.float64)
