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


def fire_encode_multi(
    u: np.ndarray, dst_starts: np.ndarray, plens: np.ndarray, w: int
) -> np.ndarray:
    """FIRE-encode MANY block-padded series stored in one concat array.

    Bit-identical to running fire_encode per segment, but vectorized
    ACROSS series: the forecaster state is sequential over a series'
    blocks, so we iterate block index k and process block k of every
    still-active series in one numpy step (series sorted longest-first so
    the active set is a prefix). Per-iteration cost is O(active) vector
    math instead of per-series python, ~20x faster on many short series.
    """
    assert w in (8, 16)
    su, ss = _UNSIGNED[w], _SIGNED[w]
    n_series = len(plens)
    starts = np.asarray(dst_starts[:-1], dtype=np.int64)
    nblk = np.asarray(plens, dtype=np.int64) // BLOCK
    if len(u) == 0 or n_series == 0:
        return np.zeros(0, dtype=su)
    # global deltas with per-series restart (d[s] = u[s], prev_val = 0)
    d = np.empty_like(u)
    d[0] = u[0]
    np.subtract(u[1:], u[:-1], out=d[1:])
    s_idx = starts[nblk > 0]
    d[s_idx] = u[s_idx]
    d = d.view(ss)
    d_prev = np.empty_like(d)
    d_prev[0] = 0
    d_prev[1:] = d[:-1]
    d_prev[s_idx] = 0
    errs = np.empty_like(d)
    order = np.argsort(-nblk, kind="stable")
    nblk_sorted = nblk[order]
    starts_sorted = starts[order]
    cbits = _COUNTER_BITS[w]
    coef_shift = LEARNING_SHIFT + (w - 4)
    whalf, wmask = 1 << (w - 1), (1 << w) - 1
    chalf, cmask = 1 << (cbits - 1), (1 << cbits) - 1
    # narrow intermediates cut memory traffic: products fit int32 for w=8
    # (i8 * 2^14-bounded coef) and int64 for w=16
    prod_t = np.int32 if w == 8 else np.int64
    counters = np.zeros(n_series, dtype=np.int64)
    max_blk = int(nblk_sorted[0]) if n_series else 0
    offs = np.arange(BLOCK, dtype=np.int64)
    k = 0
    while k < max_blk:
        # active = count of series with nblk >= k+1 (sorted desc -> prefix)
        active = int(np.searchsorted(-nblk_sorted, -(k + 1), side="right"))
        rows = (starts_sorted[:active] + k * BLOCK)[:, None] + offs
        D = d[rows]
        DP = d_prev[rows]
        coef = ((counters[:active] >> coef_shift) << (w - 4)).astype(prod_t)
        pred = ((DP.astype(prod_t) * coef[:, None]) >> np.uint8(w)).astype(ss)
        err = (D.view(su) - pred.view(su)).view(ss)
        errs[rows] = err
        neg = (-DP.astype(prod_t)).astype(ss)
        g = np.where(err == 0, ss(0), np.where(err < 0, neg, DP))
        gs = g[:, LEARNING_DOWNSAMPLE - 1 :: LEARNING_DOWNSAMPLE].astype(prod_t).sum(
            axis=1, dtype=prod_t
        ).astype(np.int64)
        gs = ((gs + whalf) & wmask) - whalf  # wrap grad_sum to sw
        counters[:active] = (
            (counters[:active] + (gs >> _GRAD_SHIFT) + chalf) & cmask
        ) - chalf
        k += 1
    return zigzag.encode(errs)


def fire_decode_multi(
    zerrs: np.ndarray, dst_starts: np.ndarray, plens: np.ndarray, w: int
) -> np.ndarray:
    """Decode MANY block-padded FIRE segments in one concat array —
    inverse of fire_encode_multi, bit-identical to fire_decode per
    segment. The within-block sample chain is sequential, so we iterate
    (block k, sample j) and process every active series per step as
    vector math; the final values come from one segmented cumsum.
    """
    assert w in (8, 16)
    su, ss = _UNSIGNED[w], _SIGNED[w]
    n_series = len(plens)
    if len(zerrs) == 0 or n_series == 0:
        return np.zeros(0, dtype=su)
    errs = zigzag.decode(np.asarray(zerrs, su))
    starts = np.asarray(dst_starts[:-1], dtype=np.int64)
    nblk = np.asarray(plens, dtype=np.int64) // BLOCK
    order = np.argsort(-nblk, kind="stable")
    nblk_sorted = nblk[order]
    starts_sorted = starts[order]
    deltas = np.empty(len(errs), dtype=ss)
    cbits = _COUNTER_BITS[w]
    coef_shift = LEARNING_SHIFT + (w - 4)
    whalf, wmask = 1 << (w - 1), (1 << w) - 1
    chalf, cmask = 1 << (cbits - 1), (1 << cbits) - 1
    prod_t = np.int32 if w == 8 else np.int64
    counters = np.zeros(n_series, dtype=np.int64)
    prev_delta = np.zeros(n_series, dtype=np.int64)
    max_blk = int(nblk_sorted[0])
    k = 0
    while k < max_blk:
        active = int(np.searchsorted(-nblk_sorted, -(k + 1), side="right"))
        base = starts_sorted[:active] + k * BLOCK
        coef = ((counters[:active] >> coef_shift) << (w - 4)).astype(prod_t)
        pd_ = prev_delta[:active].astype(prod_t)
        gs = np.zeros(active, dtype=np.int64)
        for j in range(BLOCK):
            e = errs[base + j].view(ss).astype(prod_t)
            pred = (pd_ * coef) >> np.uint8(w)
            pred = (((pred + whalf) & wmask) - whalf).astype(prod_t)
            dlt = ((pred + e + whalf) & wmask) - whalf
            deltas[base + j] = dlt.astype(ss)
            if j % LEARNING_DOWNSAMPLE == LEARNING_DOWNSAMPLE - 1:
                g = np.where(e == 0, 0, np.where(e < 0, -pd_, pd_))
                gs = gs + g
            pd_ = dlt.astype(prod_t)
        prev_delta[:active] = pd_
        gs = ((gs + whalf) & wmask) - whalf
        counters[:active] = (
            (counters[:active] + (gs >> _GRAD_SHIFT) + chalf) & cmask
        ) - chalf
        k += 1
    # segmented wraparound cumsum: d[s] is the absolute restart value
    du = deltas.view(su)
    c = np.cumsum(du, dtype=su)
    ne = np.asarray(plens, dtype=np.int64) > 0  # empty segments have no start
    off = np.zeros(len(starts), dtype=su)
    off[ne] = c[starts[ne]] - du[starts[ne]]
    return c - np.repeat(off, plens)


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
