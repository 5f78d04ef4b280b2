"""Zigzag encoding: signed integers -> unsigned, small-magnitude-favoring.

Semantics: ``enc(x) = (x << 1) ^ (x >> (w-1))`` (arithmetic shift),
``dec(u) = (u >> 1) ^ -(u & 1)`` — matching the reference's scalar macros
(reference: cpp/Compress/bitpack.h:302-303 and python/compress.py:74-131),
re-derived here as bit-pattern ops on numpy arrays of any integer width.
"""

from __future__ import annotations

import numpy as np

_UNSIGNED = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}
_SIGNED = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}


def encode(x: np.ndarray) -> np.ndarray:
    """Signed array -> unsigned array of the same width, zigzag-coded."""
    x = np.asarray(x)
    itemsize = x.dtype.itemsize
    w = itemsize * 8
    sx = x.astype(_SIGNED[itemsize], copy=False)
    u = sx.view(_UNSIGNED[itemsize])
    # (x << 1) on the bit pattern, XOR the arithmetic-shift sign smear.
    sign = np.right_shift(sx, w - 1).view(_UNSIGNED[itemsize])
    return (u << np.uint8(1)) ^ sign


def decode(u: np.ndarray) -> np.ndarray:
    """Unsigned zigzag array -> signed array of the same width."""
    u = np.asarray(u)
    itemsize = u.dtype.itemsize
    uu = u.astype(_UNSIGNED[itemsize], copy=False)
    res = (uu >> np.uint8(1)) ^ (np.uint64(0) - (uu & np.uint8(1))).astype(
        _UNSIGNED[itemsize]
    )
    return res.view(_SIGNED[itemsize])
