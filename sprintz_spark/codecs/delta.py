"""Delta-family forecasters over one numpy column.

All operate with wraparound (two's-complement) arithmetic in the column's
own width, matching the reference's predictive-coding semantics
(reference: cpp/Compress/delta.h:17-67, python/codec.py:242-382):

  * delta:        y[0]=x[0]; y[i] = x[i] - x[i-1];  decode = cumsum
  * double delta: delta twice; equals delta-of-delta for timestamps
  * dynamic delta: per fixed-size block choose delta vs double-delta by a
    loss function; 1 bit/block choice mask.

Encode/decode are fully vectorized (np.diff / np.cumsum in the unsigned
view, which is exact under mod-2^w arithmetic).
"""

from __future__ import annotations

import numpy as np

_UNSIGNED = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}
_SIGNED = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}


def _u(x: np.ndarray) -> np.ndarray:
    return x.view(_UNSIGNED[x.dtype.itemsize])


def delta_encode(x: np.ndarray) -> np.ndarray:
    """First differences, wraparound; result viewed signed. y[0] = x[0]."""
    x = np.asarray(x)
    u = _u(x.astype(_SIGNED[x.dtype.itemsize], copy=False))
    out = np.empty_like(u)
    out[0:1] = u[0:1]
    np.subtract(u[1:], u[:-1], out=out[1:])
    return out.view(_SIGNED[x.dtype.itemsize])


def delta_decode(y: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode: cumulative sum mod 2^w."""
    y = np.asarray(y)
    u = _u(y.astype(_SIGNED[y.dtype.itemsize], copy=False))
    return np.cumsum(u, dtype=u.dtype).view(_SIGNED[y.dtype.itemsize])


def double_delta_encode(x: np.ndarray) -> np.ndarray:
    return delta_encode(delta_encode(x))


def double_delta_decode(y: np.ndarray) -> np.ndarray:
    return delta_decode(delta_decode(y))


def triple_delta_encode(x: np.ndarray) -> np.ndarray:
    return delta_encode(double_delta_encode(x))


def triple_delta_decode(y: np.ndarray) -> np.ndarray:
    return double_delta_decode(delta_decode(y))


# ---------------------------------------------------------------------------
# Dynamic delta: per-block choice between delta and double-delta
# (reference semantics: python/codec.py:269-382 — 1 bit/block mask, loss
# 'logabs' by default; cpp analog cpp/Compress/online.cpp:60-160).
# ---------------------------------------------------------------------------

DYN_BLOCK = 8


def _logabs_loss_blocks(resid: np.ndarray, block: int) -> np.ndarray:
    """sum(log2(1+|r|)) per block — the reference's default codec-choice loss."""
    a = np.abs(resid.astype(np.float64))
    return np.log2(1.0 + a).reshape(-1, block).sum(axis=1)


def dynamic_delta_encode(x: np.ndarray, block: int = DYN_BLOCK):
    """Return (residuals, choice_mask_bits) — mask bit b=1 means double-delta
    was chosen for block b. Input length must be a multiple of ``block``
    (callers pad; sprintz.encode_column handles padding)."""
    x = np.asarray(x)
    n = len(x)
    assert n % block == 0, "dynamic_delta_encode requires padded input"
    d1 = delta_encode(x)
    d2 = delta_encode(d1)
    loss1 = _logabs_loss_blocks(d1, block)
    loss2 = _logabs_loss_blocks(d2, block)
    choose2 = loss2 < loss1
    resid = np.where(np.repeat(choose2, block), d2, d1)
    mask = np.packbits(choose2.astype(np.uint8), bitorder="little")
    return resid.astype(d1.dtype, copy=False), mask


def dynamic_delta_decode(resid: np.ndarray, mask: np.ndarray, block: int = DYN_BLOCK):
    """Inverse of dynamic_delta_encode.

    Reconstruction: where double-delta was chosen, resid = d2 = delta(d1);
    one cumsum pass per nesting level restores d1, then x. Because the
    choice varies per block we rebuild d1 blockwise: for a double-delta
    block, d1_block = cumsum(resid_block) + carry of previous d1 value
    (the encoder's d2[i] = d1[i] - d1[i-1] crosses block boundaries, so we
    must integrate with the true previous d1 element).
    """
    resid = np.asarray(resid)
    n = len(resid)
    nblocks = n // block
    choose2 = np.unpackbits(mask, count=nblocks, bitorder="little").astype(bool)
    itemsize = resid.dtype.itemsize
    u = resid.astype(_SIGNED[itemsize], copy=False).view(_UNSIGNED[itemsize])
    d1 = np.empty_like(u)
    prev_d1 = _UNSIGNED[itemsize](0)
    # Blockwise integration: vectorized inside each block; the cross-block
    # carry is a single scalar, so this loop is O(nblocks) with numpy bodies.
    for b in range(nblocks):
        sl = slice(b * block, (b + 1) * block)
        if choose2[b]:
            d1[sl] = np.cumsum(u[sl], dtype=u.dtype) + prev_d1
        else:
            d1[sl] = u[sl]
        prev_d1 = d1[(b + 1) * block - 1]
    return delta_decode(d1.view(_SIGNED[itemsize]))
