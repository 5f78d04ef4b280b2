"""FIRE (Fast Integer REgression) online forecaster.

Re-implements the reference's shipping FIRE semantics exactly (reference:
cpp/Compress/sprintz_xff.cpp:137-193 scalar loop; sprintz_xff_rle.cpp:73-76
constants; cpp/Compress/util.h:39-47 accumulator widths; paper
communicate/method.tex:153-271):

  * per column state: prev_val (uw), prev_delta (sw), coef accumulator
    (signed 2w-bit counter)
  * per block of 8: coef = (accum >> (learning_shift + (w-4))) << (w-4)
    (4-MSB truncation), learning_shift = 1 (eta = 1/2)
  * per sample: delta = val - prev_val (wrap sw);
    prediction = (prev_delta * coef) >> w (wide multiply, arithmetic shift,
    truncate to sw); err = delta - prediction (wrap sw)
  * sign-gradient: every 2nd sample (learning_downsample = 2),
    grad_sum += sign(err) * prev_delta (icopysign, wrap sw);
    after the block accum += grad_sum >> (log2(8) - log2(2)) = >> 2

Encode is vectorized within each block (deltas are known up front, so
predictions/errors/gradients for a whole block are single numpy ops; only
the coef update is sequential across blocks). Decode is inherently a scan
(each delta feeds the next prediction) — done with Python-int wraparound
arithmetic per sample inside an O(n) loop; the fast decode path of the
engine is the delta codec, mirroring the reference's SprintzDelta vs
SprintzFIRE speed/ratio trade-off (communicate/results.tex:162-168).
"""

from __future__ import annotations

import numpy as np

from sprintz_spark.codecs import zigzag

LEARNING_SHIFT = 1  # eta = 1/2 (reference: sprintz_xff_rle.cpp:73)
LEARNING_DOWNSAMPLE = 2  # gradient every 2nd sample (:74)
BLOCK = 8
_GRAD_SHIFT = 2  # log2(BLOCK) - log2(LEARNING_DOWNSAMPLE)

_SIGNED = {8: np.int8, 16: np.int16}
_UNSIGNED = {8: np.uint8, 16: np.uint16}
_COUNTER_BITS = {8: 16, 16: 32}  # 2w-bit accumulator (util.h:39-47)


def _wrap_signed(v: int, bits: int) -> int:
    mask = (1 << bits) - 1
    v &= mask
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def fire_encode(x: np.ndarray, w: int) -> np.ndarray:
    """uintw array (len multiple of 8) -> zigzagged FIRE residuals (uintw)."""
    assert w in (8, 16)
    su, ss = _UNSIGNED[w], _SIGNED[w]
    x = x.astype(su, copy=False)
    n = len(x)
    assert n % BLOCK == 0
    if n == 0:
        return np.zeros(0, dtype=su)
    # deltas known up front: d[i] = x[i] - x[i-1], d[0] = x[0] (prev_val=0)
    d = np.empty(n, dtype=su)
    d[0] = x[0]
    np.subtract(x[1:], x[:-1], out=d[1:])
    d = d.view(ss)
    d_prev = np.empty(n, dtype=ss)  # prev_delta at each sample
    d_prev[0] = 0
    d_prev[1:] = d[:-1]
    errs = np.empty(n, dtype=ss)
    cbits = _COUNTER_BITS[w]
    coef_shift = LEARNING_SHIFT + (w - 4)
    counter = 0
    grad_sel = np.arange(BLOCK) % LEARNING_DOWNSAMPLE == LEARNING_DOWNSAMPLE - 1
    for b in range(n // BLOCK):
        sl = slice(b * BLOCK, (b + 1) * BLOCK)
        coef = (counter >> coef_shift) << (w - 4)
        dp = d_prev[sl]
        # wide multiply then arithmetic >> w then truncate to sw (C int math)
        pred = ((dp.astype(np.int64) * coef) >> w).astype(ss)
        err = (d[sl].view(su) - pred.view(su)).view(ss)
        errs[sl] = err
        neg_dp = (-dp.astype(np.int64)).astype(ss)  # wraps like C int8 negation
        g = np.where(err == 0, ss(0), np.where(err < 0, neg_dp, dp))
        grad_sum = int(g[grad_sel].astype(np.int64).sum()) & ((1 << w) - 1)
        grad_sum = _wrap_signed(grad_sum, w)
        counter = _wrap_signed(counter + (grad_sum >> _GRAD_SHIFT), cbits)
    return zigzag.encode(errs)


def fire_decode(zerrs: np.ndarray, w: int) -> np.ndarray:
    """Inverse of fire_encode; returns the uintw sample array."""
    assert w in (8, 16)
    su, ss = _UNSIGNED[w], _SIGNED[w]
    errs = zigzag.decode(zerrs.astype(su, copy=False))
    n = len(errs)
    mask = (1 << w) - 1
    cbits = _COUNTER_BITS[w]
    coef_shift = LEARNING_SHIFT + (w - 4)
    deltas = np.empty(n, dtype=su)
    err_list = [int(e) for e in errs]  # python ints for the scan
    counter = 0
    prev_delta = 0  # signed
    pos = 0
    for _b in range(n // BLOCK):
        coef = (counter >> coef_shift) << (w - 4)
        grad_sum = 0
        for i in range(BLOCK):
            err = err_list[pos]
            pred = _wrap_signed((prev_delta * coef) >> w, w)
            delta = _wrap_signed(pred + err, w)
            if i % LEARNING_DOWNSAMPLE == LEARNING_DOWNSAMPLE - 1:
                if err != 0:
                    grad_sum = _wrap_signed(
                        grad_sum + (-prev_delta if err < 0 else prev_delta), w
                    )
            deltas[pos] = delta & mask
            prev_delta = delta
            pos += 1
        counter = _wrap_signed(counter + (grad_sum >> _GRAD_SHIFT), cbits)
    return np.cumsum(deltas, dtype=su)
