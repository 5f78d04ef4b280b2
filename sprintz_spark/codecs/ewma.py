"""EWMA (moving-average) online forecaster — the reference's
MovingAvgPredictor (cpp/Compress/online.hpp:251-285), alpha = 1/4 via the
accumulator trick:

    a(t+1) = 1/4 * x(t) + 3/4 * a(t)
    acc holds 4*a in a 2w-bit signed counter:
      predict: pred = (acc >> 2) truncated to the data width
      train:   acc += err            (err = x - pred, wrapped signed w-bit)

An IIR filter: unlike FIRE there is no per-block state boundary, so the
ENCODE direction is a per-sample scan (the reference notes jump() is
invalid for this predictor for the same reason, and its own C++ encode is
the same sequential scan). Non-default mode — the reference ships
delta/xff formats; EWMA exists for parity and for slowly drifting noisy
series where delta residuals straddle the mean.

Arithmetic note (enables the fast paths below): tracking the accumulator
as an UNSIGNED value u mod 2^cbits is exactly equivalent to the signed
counter: for signed a = u - 2^cbits, floor(a/4) = floor(u/4) - 2^(cbits-2)
and 2^(cbits-2) = 2^(2w-2) is a multiple of 2^w for w >= 2, so
(a >> 2) & wmask == (u >> 2) & wmask. That makes:

  * decode fully vectorized: acc(t) is just the cumsum of the residuals
    in the native unsigned counter dtype (wrapping cumsum), so
    out = ((cumsum_shifted >> 2) + err) & wmask in one numpy pass;
  * encode a branch-free 5-op scalar loop (signed wrap via the
    add-half/mask/sub-half identity, no function calls, no numpy scalar
    stores) — sequential because each residual feeds the accumulator that
    predicts the next sample.

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
_COUNTER_UNSIGNED = {8: np.uint16, 16: np.uint32}


def ewma_encode(x: np.ndarray, w: int) -> np.ndarray:
    """uintw array (len multiple of 8) -> zigzagged EWMA residuals."""
    assert w in (8, 16)
    su, ss = _UNSIGNED[w], _SIGNED[w]
    x = x.astype(su, copy=False)
    n = len(x)
    assert n % BLOCK == 0
    wmask = (1 << w) - 1
    half = 1 << (w - 1)
    cmask = (1 << _COUNTER_BITS[w]) - 1
    acc = 0
    errs: list[int] = []
    append = errs.append
    for xt in x.tolist():
        e = ((xt - ((acc >> SHIFT) & wmask) + half) & wmask) - half
        append(e)
        acc = (acc + e) & cmask
    return zigzag.encode(np.asarray(errs, dtype=ss))


def ewma_decode(zerrs: np.ndarray, w: int) -> np.ndarray:
    """Inverse of ewma_encode; returns the uintw sample array.

    One vectorized pass: the accumulator before sample t is the wrapping
    cumsum of the residuals (sign-extended into the counter dtype), so
    every prediction is available at once — no per-sample loop."""
    assert w in (8, 16)
    su, ss = _UNSIGNED[w], _SIGNED[w]
    errs = zigzag.decode(zerrs.astype(su, copy=False)).view(ss)
    if not len(errs):
        return np.zeros(0, su)
    cu = _COUNTER_UNSIGNED[w]
    # sign-extend residuals into the counter width, then wrapping-cumsum:
    # acc_before[t] = sum(errs[:t]) mod 2^cbits
    acc_after = np.cumsum(errs.astype(cu), dtype=cu)
    acc_before = np.empty_like(acc_after)
    acc_before[0] = 0
    acc_before[1:] = acc_after[:-1]
    pred = (acc_before >> SHIFT).astype(su)  # & wmask via the cast
    return (pred + errs.view(su)).astype(su)
