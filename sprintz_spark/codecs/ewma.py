"""EWMA (moving-average) online forecaster — the reference's
MovingAvgPredictor (cpp/Compress/online.hpp:251-285), alpha = 1/4 via the
accumulator trick:

    a(t+1) = 1/4 * x(t) + 3/4 * a(t)
    acc holds 4*a in a 2w-bit signed counter:
      predict: pred = (acc >> 2) truncated to the data width
      train:   acc += err            (err = x - pred, wrapped signed w-bit)

An IIR filter: unlike FIRE there is no per-block state boundary, so both
encode and decode are per-sample scans (the reference notes jump() is
invalid for this predictor for the same reason). Non-default mode — the
reference ships delta/xff formats; EWMA exists for parity and for slowly
drifting noisy series where delta residuals straddle the mean.

Initialization: the accumulator starts at 0, so err[0] stores x0 itself —
self-contained blobs, consistent with this engine's other modes (the
reference seeds init(first_value) out-of-band instead; same filter after
the first sample).
"""

from __future__ import annotations

import numpy as np

from sprintz_spark.codecs import zigzag

SHIFT = 2  # alpha = 1/4 (online.hpp:254 _shift)
BLOCK = 8

_SIGNED = {8: np.int8, 16: np.int16}
_UNSIGNED = {8: np.uint8, 16: np.uint16}
_COUNTER_BITS = {8: 16, 16: 32}  # int32 accumulator for u16 (online.hpp:284)


def _wrap_signed(v: int, bits: int) -> int:
    mask = (1 << bits) - 1
    v &= mask
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def ewma_encode(x: np.ndarray, w: int) -> np.ndarray:
    """uintw array (len multiple of 8) -> zigzagged EWMA residuals."""
    assert w in (8, 16)
    su, ss = _UNSIGNED[w], _SIGNED[w]
    x = x.astype(su, copy=False)
    n = len(x)
    assert n % BLOCK == 0
    errs = np.empty(n, dtype=ss)
    wmask = (1 << w) - 1
    cbits = _COUNTER_BITS[w]
    acc = 0
    xs = x.tolist()
    for t in range(n):
        pred = (acc >> SHIFT) & wmask  # data_t truncation of the int32 shift
        err = _wrap_signed(xs[t] - pred, w)
        errs[t] = err
        acc = _wrap_signed(acc + err, cbits)
    return zigzag.encode(errs)


def ewma_decode(zerrs: np.ndarray, w: int) -> np.ndarray:
    """Inverse of ewma_encode; returns the uintw sample array."""
    assert w in (8, 16)
    su, ss = _UNSIGNED[w], _SIGNED[w]
    errs = zigzag.decode(zerrs.astype(su, copy=False)).view(ss)
    n = len(errs)
    out = np.empty(n, dtype=su)
    wmask = (1 << w) - 1
    cbits = _COUNTER_BITS[w]
    acc = 0
    es = errs.tolist()
    for t in range(n):
        pred = (acc >> SHIFT) & wmask
        out[t] = (pred + es[t]) & wmask
        acc = _wrap_signed(acc + es[t], cbits)
    return out
