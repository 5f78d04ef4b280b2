"""Run-length coding of the per-block bitwidth (header) stream + varints.

The reference RLE-codes runs of all-zero blocks with a 7-bit-continuation
varint run counter capped at 0x7fff blocks (reference:
cpp/Compress/sprintz_delta_rle.cpp:214-276, run cap at :68). We generalize:
the whole header stream is (value, run-length) coded — a run of zero-width
blocks (constant signal under delta) costs ~3 bytes total regardless of
length, and so does any other constant-width stretch.
"""

from __future__ import annotations

import numpy as np

RUN_CAP = 0x7FFF  # max blocks per run (reference: sprintz_delta_rle.cpp:68)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style 7-bit-continuation varint, vectorized for values < 2^15
    (the RUN_CAP guarantees this for run lengths)."""
    values = np.asarray(values, dtype=np.int64)
    assert (values >= 0).all() and (values <= RUN_CAP).all()
    small = values < 128
    out = np.empty(int(len(values) + (~small).sum()), dtype=np.uint8)
    # positions: each value takes 1 or 2 bytes
    sizes = np.where(small, 1, 2)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    out[starts[small]] = values[small]
    big = ~small
    out[starts[big]] = (values[big] & 0x7F) | 0x80
    out[starts[big] + 1] = values[big] >> 7
    return out.tobytes()


def varint_decode(buf: bytes, count: int) -> tuple[np.ndarray, int]:
    """Decode ``count`` varints; returns (values, bytes_consumed)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    values = np.empty(count, dtype=np.int64)
    pos = 0
    for i in range(count):
        b0 = int(arr[pos])
        if b0 & 0x80:
            values[i] = (b0 & 0x7F) | (int(arr[pos + 1]) << 7)
            pos += 2
        else:
            values[i] = b0
            pos += 1
    return values, pos


def rle_encode(seq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(values, run_lengths) for a 1-D array, runs capped at RUN_CAP."""
    seq = np.asarray(seq)
    if len(seq) == 0:
        return np.empty(0, seq.dtype), np.empty(0, np.int64)
    change = np.flatnonzero(np.diff(seq) != 0)
    starts = np.concatenate([[0], change + 1])
    lengths = np.diff(np.concatenate([starts, [len(seq)]]))
    values = seq[starts]
    if lengths.max() > RUN_CAP:
        # split over-cap runs (vectorized expansion)
        reps = (lengths + RUN_CAP - 1) // RUN_CAP
        values = np.repeat(values, reps)
        split = []
        for length, r in zip(lengths, reps):
            if r == 1:
                split.append(length)
            else:
                split.extend([RUN_CAP] * (r - 1) + [length - RUN_CAP * (r - 1)])
        lengths = np.asarray(split, dtype=np.int64)
    return values, lengths.astype(np.int64)


def rle_decode(values: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    return np.repeat(values, lengths)


def uvarint_batch(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128 varints for arbitrary uint64 values, vectorized across the
    batch; returns (concatenated bytes, offsets[n+1]) so value i's varint
    is buf[offsets[i]:offsets[i+1]]. Byte-identical to the scalar encoder."""
    from sprintz_spark.codecs import bitpack

    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b"", np.zeros(1, np.int64)
    bl = bitpack.bit_length(v).astype(np.int64)
    nb = np.maximum(1, (bl + 6) // 7)
    offs = np.concatenate([[0], np.cumsum(nb)])
    out = np.zeros(int(offs[-1]), np.uint8)
    starts = offs[:-1]
    for j in range(int(nb.max())):
        sel = nb > j
        byte = ((v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[sel] - 1 > j).astype(np.uint8) << 7
        out[starts[sel] + j] = byte | cont
    return out.tobytes(), offs


def rle_runs_segmented(
    seq: np.ndarray, seg_starts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Global RLE of a concatenated stream with runs FORCED to break at
    segment boundaries (and at RUN_CAP) — equivalent to rle_encode run
    independently per segment, in one vectorized pass.

    Returns (run_starts, run_values, run_lengths); run_starts is sorted so
    each segment's runs are the slice searchsorted(run_starts, seg_start)
    .. searchsorted(run_starts, seg_end)."""
    seq = np.asarray(seq)
    n = len(seq)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, seq.dtype), np.empty(0, np.int64)
    brk = np.zeros(n, dtype=bool)
    brk[0] = True
    brk[1:] = seq[1:] != seq[:-1]
    ss = np.asarray(seg_starts, dtype=np.int64)
    brk[ss[(ss >= 0) & (ss < n)]] = True
    r_starts = np.flatnonzero(brk).astype(np.int64)
    r_lens = np.diff(np.append(r_starts, n))
    r_vals = seq[r_starts]
    if r_lens.max() > RUN_CAP:
        reps = (r_lens + RUN_CAP - 1) // RUN_CAP
        idx = np.repeat(np.arange(len(r_lens)), reps)
        k = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
        )
        r_starts = r_starts[idx] + k * RUN_CAP
        r_lens = np.minimum(r_lens[idx] - k * RUN_CAP, RUN_CAP)
        r_vals = r_vals[idx]
    return r_starts, r_vals, r_lens.astype(np.int64)


def encode_headers(nbits: np.ndarray) -> bytes:
    """Serialize the per-block bitwidth stream: u32 #runs, then run values
    (u8 each), then run lengths (varint each)."""
    if len(nbits) < 64:
        # pure-python fast path: numpy call overhead dominates tiny headers
        vals, lens = [], []
        prev, run = None, 0
        for b in nbits.tolist():
            if b == prev and run < RUN_CAP:
                run += 1
            else:
                if prev is not None:
                    vals.append(prev)
                    lens.append(run)
                prev, run = b, 1
        if prev is not None:
            vals.append(prev)
            lens.append(run)
        out = bytearray(len(vals).to_bytes(4, "little"))
        out += bytes(vals)
        for ln in lens:
            if ln < 128:
                out.append(ln)
            else:
                out.append((ln & 0x7F) | 0x80)
                out.append(ln >> 7)
        return bytes(out)
    values, lengths = rle_encode(nbits.astype(np.uint8))
    nruns = np.uint32(len(values)).tobytes()
    return nruns + values.astype(np.uint8).tobytes() + varint_encode(lengths)


def decode_headers(buf: bytes) -> tuple[np.ndarray, int]:
    """Returns (nbits array, bytes consumed)."""
    nruns = int.from_bytes(buf[:4], "little")
    if nruns < 16:
        # pure-python fast path for tiny headers
        values, lengths, pos = [], [], 4 + nruns
        for i in range(nruns):
            values.append(buf[4 + i])
            b0 = buf[pos]
            if b0 & 0x80:
                lengths.append((b0 & 0x7F) | (buf[pos + 1] << 7))
                pos += 2
            else:
                lengths.append(b0)
                pos += 1
        out = np.repeat(np.array(values, dtype=np.uint8), lengths) if nruns else np.zeros(0, np.uint8)
        return out, pos
    values = np.frombuffer(buf[4 : 4 + nruns], dtype=np.uint8)
    lengths, used = varint_decode(buf[4 + nruns :], nruns)
    return rle_decode(values, lengths), 4 + nruns + used
