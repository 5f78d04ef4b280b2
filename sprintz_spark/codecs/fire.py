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
    segment.

    Optimistic zero-coef scan (r10): when a block's coef is 0, its deltas
    equal its errors and its gradient sum depends ONLY on that block's
    errors (pred is 0, so every within-block prev_delta is the previous
    error; the j=0 gradient position is never sampled because
    LEARNING_DOWNSAMPLE >= 2). Both are therefore precomputable for ALL
    blocks in two global passes, and a run of zero-coef blocks advances a
    series' counter by a plain prefix sum of per-block steps. The decode
    walks each series as: vectorized segmented scan to the first
    nonzero-coef block (validated against the wrapped counter prefix),
    accept the run wholesale, then decode that one block with the exact
    8-step loop (vectorized across every series currently stopped at a
    nonzero-coef block), repeat. Real-tier measurements show 80-99% of
    series-blocks have coef == 0, and the previous lockstep-over-blocks
    loop serialized on nblk skew (p99 ~26 blocks but max ~1700: thousands
    of numpy steps at active<=76); this form's round count is bounded by
    the worst single series' NONZERO-coef block count instead of its
    total block count. A doubling lookahead window caps the rescan cost
    so adversarial all-nonzero data degrades to the old lockstep cost,
    not O(n^2)."""
    assert w in (8, 16)
    su, ss = _UNSIGNED[w], _SIGNED[w]
    n_series = len(plens)
    if len(zerrs) == 0 or n_series == 0:
        return np.zeros(0, dtype=su)
    errs = zigzag.decode(np.asarray(zerrs, su))
    starts = np.asarray(dst_starts[:-1], dtype=np.int64)
    plens = np.asarray(plens, dtype=np.int64)
    nblk = plens // BLOCK
    cbits = _COUNTER_BITS[w]
    coef_shift = LEARNING_SHIFT + (w - 4)
    whalf, wmask = 1 << (w - 1), (1 << w) - 1
    chalf, cmask = 1 << (cbits - 1), (1 << cbits) - 1
    prod_t = np.int32 if w == 8 else np.int64
    E = errs.view(ss)
    deltas = E.copy()  # correct wherever coef == 0; exact blocks patch it
    # per-block gradient-sum under the zero-coef assumption (valid for
    # exactly the blocks the scan accepts)
    Eb = E.reshape(-1, BLOCK)
    gpos = np.arange(BLOCK) % LEARNING_DOWNSAMPLE == LEARNING_DOWNSAMPLE - 1
    e_g = Eb[:, gpos]
    pd_g = Eb[:, np.flatnonzero(gpos) - 1].astype(np.int64)
    g = np.where(e_g == 0, 0, np.where(e_g < 0, -pd_g, pd_g))
    gs0 = g.sum(axis=1, dtype=np.int64)
    gs0 = ((gs0 + whalf) & wmask) - whalf
    step0 = gs0 >> _GRAD_SHIFT
    blk_start = starts // BLOCK
    blk_end = blk_start + nblk
    counters = np.zeros(n_series, dtype=np.int64)
    prev_delta = np.zeros(n_series, dtype=np.int64)
    pos = blk_start.copy()
    unfinished = nblk > 0
    look_cap = 64
    while True:
        idxs = np.flatnonzero(unfinished)
        if not len(idxs):
            break
        rem = blk_end[idxs] - pos[idxs]
        look = np.minimum(rem, look_cap)
        total = int(look.sum())
        seg_off = np.zeros(len(idxs) + 1, np.int64)
        np.cumsum(look, out=seg_off[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(
            seg_off[:-1], look
        )
        blocks = np.repeat(pos[idxs], look) + within
        steps = step0[blocks]
        cum = np.cumsum(steps)
        excl = cum - steps
        excl_in = excl - np.repeat(excl[seg_off[:-1]], look)
        counter_t = (
            (np.repeat(counters[idxs], look) + excl_in + chalf) & cmask
        ) - chalf
        coef_t = (counter_t >> coef_shift) << (w - 4)
        cand = np.where(coef_t != 0, within, np.int64(1) << 60)
        runlen = np.minimum(np.minimum.reduceat(cand, seg_off[:-1]), look)
        run_sum = np.add.reduceat(
            np.where(within < np.repeat(runlen, look), steps, 0),
            seg_off[:-1],
        )
        counters[idxs] = ((counters[idxs] + run_sum + chalf) & cmask) - chalf
        newpos = pos[idxs] + runlen
        moved = runlen > 0
        prev_delta[idxs[moved]] = E[newpos[moved] * BLOCK - 1]
        pos[idxs] = newpos
        fin = newpos >= blk_end[idxs]
        unfinished[idxs[fin]] = False
        # exact 8-step decode of the one nonzero-coef block each stopped
        # series is sitting on (windows that ended with coef still 0 just
        # rescan with a larger lookahead)
        sub = idxs[(~fin) & (runlen < look)]
        if len(sub):
            base = pos[sub] * BLOCK
            coef = ((counters[sub] >> coef_shift) << (w - 4)).astype(prod_t)
            pd_ = prev_delta[sub].astype(prod_t)
            gs = np.zeros(len(sub), dtype=np.int64)
            for j in range(BLOCK):
                e = E[base + j].astype(prod_t)
                pred = (pd_ * coef) >> np.uint8(w)
                pred = (((pred + whalf) & wmask) - whalf).astype(prod_t)
                dlt = ((pred + e + whalf) & wmask) - whalf
                deltas[base + j] = dlt.astype(ss)
                if j % LEARNING_DOWNSAMPLE == LEARNING_DOWNSAMPLE - 1:
                    gs = gs + np.where(e == 0, 0, np.where(e < 0, -pd_, pd_))
                pd_ = dlt.astype(prod_t)
            prev_delta[sub] = pd_
            gs = ((gs + whalf) & wmask) - whalf
            counters[sub] = (
                (counters[sub] + (gs >> _GRAD_SHIFT) + chalf) & cmask
            ) - chalf
            pos[sub] += 1
            done = pos[sub] >= blk_end[sub]
            unfinished[sub[done]] = False
        look_cap = min(look_cap * 2, 1 << 13)
    # segmented wraparound cumsum: d[s] is the absolute restart value
    du = deltas.view(su)
    c = np.cumsum(du, dtype=su)
    ne = plens > 0  # empty segments have no start
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
