"""The composed sprintz column codec + self-describing wire format.

Pipeline per column (reference pipeline shape: forecast -> zigzag ->
bit-pack -> RLE; communicate/method.tex §3, cpp/Compress/sprintz_delta_rle.cpp
and sprintz_xff_rle.cpp — re-architected for numpy vectorization, not a
byte-level port):

    residuals = forecast(x)   # delta | doubledelta | dyndelta | fire | ewma
    z = zigzag(residuals)           # fire already returns zigzagged errs
    nbits[b] = block width per 8-sample block (w-1 -> w promotion)
    headers = RLE(value, varint runlen) over the nbits stream
    payload = width-grouped little-endian bit packing

Wire formats (one BinaryType cell per series chunk; first byte selects):

  'Y' (0x59) — compact head + out-of-band firsts (delta/doubledelta,
      1 <= n <= 65536): 'Y' | mode(3b)|w_code(2b)|pad(3b) | (n-1) u16 |
      uvarint zz(x0) [| uvarint zz(d1) for doubledelta] | uvarint nruns |
      run values u8[] | run lengths varint[] | payload. The leading
      residual slots and trailing pad-slot residuals are zeroed, and
      trailing zero payload bytes are stripped (decode zero-extends), so
      a regular series of any length costs ~21 B.
  'Z' (0x5A) — compact head, in-stream firsts (fire/raw, small chunks):
      'Z' | packed | n u16 | nruns u8 | headers | payload.
  'SZ1' (0x53…) — full head (large n or dyndelta's extra):
      'SZ1' | mode u8 | w u8 | n u32 | pad u8 | extra_len u16 | extra |
      headers (u32-nruns) | payload.
  'C' (0x43) — multi-series container: many series of one column in a
      single blob (shared headers/payload, per-series varint length +
      varint firsts) — see encode_container; used by tiers whose
      per-key series are tiny (the daily tier).
  'W' (0x57) — zlib wrapper around any of the above, applied per blob
      when it shrinks it (cost-based entropy post-pass — the paper's
      Huffman stage, method.tex:300-303).

Supported element widths: 8, 16, 32, 64 (FIRE: 8/16 only, like the
reference's C core — cpp/Compress/sprintz_delta_rle.cpp:58-61).
"""

from __future__ import annotations

import zlib

import numpy as np

from sprintz_spark.codecs import bitpack, delta, ewma, fire, rle, zigzag

MAGIC = b"SZ1"
MAGIC2 = 0x5A  # b'Z': compact head for small chunks (n < 65536, no extra)
MAGIC3 = 0x59  # b'Y': compact head + out-of-band first value(s)
MAGIC_DEFLATE = 0x57  # b'W': zlib-wrapped blob (cost-based post-pass)
BLOCK = bitpack.BLOCK

# Entropy-coding post-pass (the paper's Huffman stage, method.tex:300-303,
# expressed with stdlib zlib): applied per blob when it actually shrinks
# it. ~10µs/blob; disable for max-throughput encoding.
DEFLATE_MIN = 64  # don't bother below this size


def _maybe_deflate(blob: bytes, enable: bool = True) -> bytes:
    if not enable or len(blob) < DEFLATE_MIN:
        return blob
    z = zlib.compress(blob, 6)
    return bytes([MAGIC_DEFLATE]) + z if len(z) + 1 < len(blob) else blob


def _inflate(buf: bytes) -> bytes:
    return zlib.decompress(memoryview(buf)[1:]) if buf[0] == MAGIC_DEFLATE else buf

MODES = {"delta": 0, "doubledelta": 1, "dyndelta": 2, "fire": 3, "raw": 4,
         "ewma": 5, "booldelta": 6}
_MODE_NAMES = {v: k for k, v in MODES.items()}
_W_CODE = {8: 0, 16: 1, 32: 2, 64: 3}
_W_FROM_CODE = {v: k for k, v in _W_CODE.items()}


def _head2(mode: str, w: int, n: int, pad: int) -> bytes:
    """4-byte compact head: 'Z' | mode(3b)|w_code(2b)|pad(3b) | n u16.
    Tiny series pay 12+ bytes of head in the v1 format — for 1-3-point
    daily-tier chunks that overhead alone exceeded the raw data."""
    packed = (MODES[mode] << 5) | (_W_CODE[w] << 3) | pad
    return bytes([MAGIC2, packed]) + int(n).to_bytes(2, "little")


def _headers_compact(nbits: np.ndarray) -> bytes:
    """rle.encode_headers with a 1-byte run count (nruns < 256)."""
    full = rle.encode_headers(nbits)
    nruns = int.from_bytes(full[:4], "little")
    assert nruns < 256
    return bytes([nruns]) + full[4:]


# --- v2 'Y' format: first value(s) out-of-band -----------------------------
#
# A series' first residual under delta is the raw start value (and under
# double-delta the second residual embeds the first gap). For epoch-µs
# timestamps that is ~52 bits, blowing the first 8-sample block up to
# ~52 bytes even for a 2-point series. 'Y' stores x0 (and d1 for
# doubledelta) as zigzag-varints in the head, zeroes those residual slots,
# and strips trailing zero payload bytes (decode zero-extends). A regular
# daily series of ANY length then packs to ~20 bytes: head(4) + varints +
# all-zero-block headers(3) + empty payload.
#
#   'Y' | mode(3b)|w_code(2b)|pad(3b) | (n-1) u16 | uvarint zz(x0)
#   [| uvarint zz(d1) if doubledelta] | uvarint nruns | run vals u8[] |
#   run lens varint[] | payload (trailing zeros stripped)


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, pos
        shift += 7


def _zz_scalar(u_val: int, w: int) -> int:
    """Zigzag of a stored w-bit value (interpreted as signed), python ints."""
    mask = (1 << w) - 1
    s = u_val & mask
    if s >> (w - 1):
        s -= 1 << w
    return ((s << 1) ^ (s >> (w - 1))) & mask


def _unzz_scalar(zz: int, w: int) -> int:
    """Inverse of _zz_scalar; returns the unsigned w-bit bit pattern."""
    return ((zz >> 1) ^ -(zz & 1)) & ((1 << w) - 1)


def _head3(mode: str, w: int, n: int, pad: int, x0: int, d1: int | None) -> bytes:
    packed = (MODES[mode] << 5) | (_W_CODE[w] << 3) | pad
    out = bytes([MAGIC3, packed]) + (int(n) - 1).to_bytes(2, "little")
    out += _uvarint(_zz_scalar(int(x0), w))
    if d1 is not None:
        out += _uvarint(_zz_scalar(int(d1), w))
    return out


def _headers_v(nbits: np.ndarray) -> bytes:
    """rle.encode_headers with a varint run count (any nruns)."""
    full = rle.encode_headers(nbits)
    nruns = int.from_bytes(full[:4], "little")
    return _uvarint(nruns) + full[4:]


def _payload_ends(payload: bytes, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Per-series payload end offsets with trailing zero bytes stripped —
    the vectorized equivalent of payload[lo:hi].rstrip(b'\\x00') per
    series (decode zero-extends, so truncation is lossless)."""
    lo = np.asarray(lo, np.int64)
    hi = np.asarray(hi, np.int64)
    if not len(payload):
        return lo.copy()
    arr = np.frombuffer(payload, np.uint8)
    nz = np.flatnonzero(arr)
    pos = np.searchsorted(nz, hi, side="left") - 1
    ends = np.where(pos >= 0, nz[np.maximum(pos, 0)] + 1, 0)
    return np.maximum(ends, lo)


def _headers_batch(nb: np.ndarray, blk_starts: np.ndarray, blk_hi: np.ndarray):
    """Header-stream serialization pieces for MANY series in global numpy
    passes (byte-identical to rle.encode_headers per series). Series i's
    header body is vb[f[i]:f_hi[i]] + lb[lo[f[i]]:lo[f_hi[i]]] with
    nruns = f_hi[i] - f[i]; callers prepend their run-count framing."""
    r_starts, r_vals, r_lens = rle.rle_runs_segmented(nb, blk_starts)
    f = np.searchsorted(r_starts, blk_starts).astype(np.int64)
    f_hi = np.searchsorted(r_starts, blk_hi).astype(np.int64)
    vb = r_vals.astype(np.uint8).tobytes()
    lb = rle.varint_encode(r_lens)
    lo = _cumsum0(np.where(r_lens < 128, 1, 2))
    return f, f_hi, vb, lb, lo


def _zero_extend(payload: bytes, nbits: np.ndarray) -> bytes:
    """Undo trailing-zero truncation: block b holds exactly nbits[b] bytes."""
    expected = int(nbits.astype(np.int64).sum())
    if len(payload) < expected:
        return bytes(payload) + b"\x00" * (expected - len(payload))
    return payload

_UNSIGNED = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}
_SIGNED = {8: np.int8, 16: np.int16, 32: np.int32, 64: np.int64}


def _pad_repeat_last(u: np.ndarray) -> tuple[np.ndarray, int]:
    """Pad to a block multiple by repeating the last value (zero residuals
    under delta), returning (padded, pad_count)."""
    n = len(u)
    rem = (-n) % BLOCK
    if rem == 0:
        return u, 0
    fill = u[-1] if n else u.dtype.type(0)
    return np.concatenate([u, np.full(rem, fill, dtype=u.dtype)]), rem


def encode_column(x: np.ndarray, mode: str = "delta", deflate: bool = True) -> bytes:
    """Encode an integer numpy array into the SZ1 format."""
    x = np.asarray(x)
    if x.dtype.kind == "b":
        x = x.view(np.uint8)
    w = x.dtype.itemsize * 8
    if w not in _UNSIGNED:
        raise ValueError(f"unsupported element width {w}")
    if mode in ("fire", "ewma") and w not in (8, 16):
        raise ValueError(f"{mode} supports 8/16-bit elements only")
    if mode == "booldelta" and w != 8:
        raise ValueError("booldelta takes bool/uint8 arrays")
    if x.dtype.kind not in "iu":
        raise TypeError(
            f"encode_column takes integer arrays, got {x.dtype}; "
            "quantize floats first (codecs.quantize) or use codecs.gorilla"
        )
    u = x.view(_UNSIGNED[w])
    n = len(u)
    padded, pad = _pad_repeat_last(u)
    extra = b""
    firsts = None
    if mode == "delta":
        z = zigzag.encode(delta.delta_encode(padded))
        if 1 <= n <= 65536:
            firsts = (int(padded[0]), None)
            z[0] = 0
    elif mode == "doubledelta":
        z = zigzag.encode(delta.double_delta_encode(padded))
        z[n:] = 0  # pad slots are decode-discarded; repeat-last padding
        # would otherwise put a -d1 spike in the last block
        if 1 <= n <= 65536:
            d1 = (int(padded[1]) - int(padded[0])) & ((1 << w) - 1)
            firsts = (int(padded[0]), d1)
            z[0] = 0
            z[1] = 0
    elif mode == "dyndelta":
        resid, mask = delta.dynamic_delta_encode(padded, BLOCK)
        z = zigzag.encode(resid)
        extra = mask.tobytes()
    elif mode == "fire":
        z = fire.fire_encode(padded, w)
        z[n:] = 0  # pad-slot prediction errors are decode-discarded
    elif mode == "ewma":
        z = ewma.ewma_encode(padded, w)
        z[n:] = 0  # pads are trailing: zeroing can't affect earlier state
    elif mode == "booldelta":
        # XOR-delta for booleans — the codec the reference declares but
        # never implements (codec.py:238-239: "can't just uint8 because
        # -1 and +1 delta are the same"): XOR with the previous value is
        # the self-inverse change indicator, residuals stay in {0,1}
        # (no zigzag), and constant runs become zero runs so bitpack/RLE
        # see the same structure integer delta exposes. Repeat-last
        # padding XORs to 0 in the pad slots for free.
        z = np.bitwise_xor(padded, np.concatenate((padded[:1] * 0, padded[:-1])))
    elif mode == "raw":
        z = padded
    else:
        raise ValueError(f"unknown mode {mode}")
    nbits = bitpack.block_nbits(z, BLOCK)
    payload = bitpack.pack_blocks(z, nbits, BLOCK).rstrip(b"\x00")
    if firsts is not None:
        return _maybe_deflate(
            _head3(mode, w, n, pad, firsts[0], firsts[1])
            + _headers_v(nbits)
            + payload,
            deflate,
        )
    if not extra and n < 65536 and len(nbits) <= 255:
        return _maybe_deflate(
            _head2(mode, w, n, pad) + _headers_compact(nbits) + payload, deflate
        )
    head = (
        MAGIC
        + bytes([MODES[mode], w])
        + np.uint32(n).tobytes()
        + bytes([pad])
        + np.uint16(len(extra)).tobytes()
        + extra
    )
    return _maybe_deflate(head + rle.encode_headers(nbits) + payload, deflate)


def blob_mode(buf: bytes) -> str:
    """Codec mode of a blob (works for all head formats)."""
    buf = _inflate(buf)
    if buf[0] in (MAGIC2, MAGIC3):
        return _MODE_NAMES[buf[1] >> 5]
    return _MODE_NAMES[buf[3]]


def _parse(buf: bytes):
    """Returns (mode, w, n, pad, extra, nbits, payload, firsts).

    ``firsts`` is None for in-stream-start formats ('Z'/SZ1) or
    ``(x0, d1_or_None)`` unsigned bit patterns for the 'Y' format.
    ``payload`` may be trailing-zero truncated (see _zero_extend).
    """
    buf = _inflate(buf)
    if buf[0] == MAGIC3:  # 'Y': compact head + out-of-band firsts
        packed = buf[1]
        mode = _MODE_NAMES[packed >> 5]
        w = _W_FROM_CODE[(packed >> 3) & 0x3]
        pad = packed & 0x7
        n = int.from_bytes(buf[2:4], "little") + 1
        pos = 4
        zz0, pos = _read_uvarint(buf, pos)
        d1 = None
        if mode == "doubledelta":
            zz1, pos = _read_uvarint(buf, pos)
            d1 = _unzz_scalar(zz1, w)
        nruns, pos = _read_uvarint(buf, pos)
        nbits, used = rle.decode_headers(
            nruns.to_bytes(4, "little") + buf[pos:]
        )
        payload = buf[pos + used - 4 :]
        return mode, w, n, pad, b"", nbits, payload, (_unzz_scalar(zz0, w), d1)
    if buf[0] == MAGIC2:  # 'Z': compact head
        packed = buf[1]
        mode = _MODE_NAMES[packed >> 5]
        w = _W_FROM_CODE[(packed >> 3) & 0x3]
        pad = packed & 0x7
        n = int.from_bytes(buf[2:4], "little")
        nruns = buf[4]
        nbits, used = rle.decode_headers(
            nruns.to_bytes(4, "little") + buf[5:]
        )
        payload = buf[5 + used - 4 :]
        return mode, w, n, pad, b"", nbits, payload, None
    assert buf[:3] == MAGIC, "bad magic"
    mode = _MODE_NAMES[buf[3]]
    w = buf[4]
    n = int(np.frombuffer(buf[5:9], dtype=np.uint32)[0])
    pad = buf[9]
    extra_len = int(np.frombuffer(buf[10:12], dtype=np.uint16)[0])
    extra = buf[12 : 12 + extra_len]
    rest = buf[12 + extra_len :]
    nbits, used = rle.decode_headers(rest)
    payload = rest[used:]
    return mode, w, n, pad, extra, nbits, payload, None


def decode_column(buf: bytes) -> np.ndarray:
    """Decode SZ1 bytes back to the original unsigned array (length n).

    Callers that encoded signed data should .view() the signed dtype.
    """
    mode, w, n, pad, extra, nbits, payload, firsts = _parse(buf)
    payload = _zero_extend(payload, nbits)
    z = bitpack.unpack_blocks(payload, nbits, _UNSIGNED[w], BLOCK)
    su = _UNSIGNED[w]
    if firsts is not None:
        zd = zigzag.decode(z).view(su)
        zd[0] = su(firsts[0])
        if mode == "doubledelta":
            zd[1] = su((firsts[1] - firsts[0]) & ((1 << w) - 1))
        if mode == "delta":
            out = delta.delta_decode(zd.view(_SIGNED[w])).view(su)
        else:
            out = delta.double_delta_decode(zd.view(_SIGNED[w])).view(su)
        return out[:n]
    if mode == "delta":
        out = delta.delta_decode(zigzag.decode(z)).view(_UNSIGNED[w])
    elif mode == "doubledelta":
        out = delta.double_delta_decode(zigzag.decode(z)).view(_UNSIGNED[w])
    elif mode == "dyndelta":
        mask = np.frombuffer(extra, dtype=np.uint8)
        out = delta.dynamic_delta_decode(zigzag.decode(z), mask, BLOCK).view(
            _UNSIGNED[w]
        )
    elif mode == "fire":
        out = fire.fire_decode(z, w)
    elif mode == "ewma":
        out = ewma.ewma_decode(z, w)
    elif mode == "booldelta":
        out = np.bitwise_xor.accumulate(z)
    elif mode == "raw":
        out = z
    else:  # pragma: no cover
        raise ValueError(mode)
    return out[:n]


def _segmented_cumsum(d: np.ndarray, starts: np.ndarray, plens: np.ndarray) -> np.ndarray:
    """Wraparound cumsum restarting at each segment (whose first element is
    stored as an absolute value by the encoders)."""
    c = np.cumsum(d, dtype=d.dtype)
    off = c[starts] - d[starts]
    return c - np.repeat(off, plens)


def _group_pass(mode, w, idx, ns, plens, nbits_concat, payload_concat,
                f_pos, f0_u, f1_u, out) -> None:
    """Shared per-(mode, w) decode pass: unpack the concatenated payload,
    scatter out-of-band firsts, run the mode's inverse transform, slice
    each blob's values into ``out``. ``f_pos``/``f0_u``/``f1_u`` are the
    value-domain positions and unsigned bit patterns of 'Y' firsts
    (``f1_u`` pre-adjusted to the residual slot value, or None)."""
    su = _UNSIGNED[w]
    dst_starts = _cumsum0(plens)
    z = bitpack.unpack_blocks(payload_concat, nbits_concat, su, BLOCK)
    starts = dst_starts[:-1]
    nonempty = plens > 0
    s_idx = starts[nonempty]
    if mode == "raw":
        x = z
    elif mode == "fire":
        x = fire.fire_decode_multi(z, dst_starts, plens, w)
    else:
        d = zigzag.decode(z).view(su)
        if f_pos is not None and len(f_pos):
            d[f_pos] = f0_u.astype(su)
            if mode == "doubledelta":
                d[f_pos + 1] = f1_u.astype(su)
        x = _segmented_cumsum(d, s_idx, plens[nonempty]) if len(d) else d
        if mode == "doubledelta":
            x = _segmented_cumsum(x, s_idx, plens[nonempty])
    for i, lo, n in zip(idx, starts, ns):
        out[i] = x[lo : lo + int(n)]


def _uvarints_at(big, pos):
    """Read one LEB128 varint starting at each position of ``pos`` —
    vectorized across positions (<= 10 masked passes, one per varint
    byte). Returns (values u64, positions after the varints)."""
    m = len(pos)
    vals = np.zeros(m, np.uint64)
    cur = pos.astype(np.int64).copy()
    if not m:
        return vals, cur
    active = np.arange(m)
    shift = np.uint64(0)
    while len(active):
        b = big[cur[active]].astype(np.uint64)
        vals[active] |= (b & np.uint64(0x7F)) << shift
        cur[active] += 1
        active = active[(b & np.uint64(0x80)) != 0]
        shift += np.uint64(7)
    return vals, cur


# batchable compact-head modes (delta / doubledelta / fire / raw);
# dyndelta / ewma / booldelta carry per-blob state and stay scalar
_BATCH_MODES = frozenset((0, 1, 3, 4))
_BATCH_MAX_RUNS = 128  # larger headers amortize the scalar parse fine


def _decode_items(mode, w, items, out) -> None:
    """Legacy per-blob-parsed route (v1 heads, deflated blobs, big
    headers): items are (i, n, pad, nbits, payload, firsts) tuples."""
    mask = (1 << w) - 1
    nbits_concat = (
        np.concatenate([it[3] for it in items]) if items else np.zeros(0, np.uint8)
    )
    payload_concat = b"".join(it[4] for it in items)
    ns = np.array([it[1] for it in items], dtype=np.int64)
    plens = ns + np.array([it[2] for it in items], dtype=np.int64)
    starts = _cumsum0(plens)[:-1]
    with_f = [
        (k, it) for k, it in enumerate(items) if it[5] is not None and it[1]
    ]
    f_pos = np.array([starts[k] for k, _ in with_f], dtype=np.int64)
    f0 = np.array([it[5][0] for _, it in with_f], dtype=np.uint64)
    f1 = None
    if mode == "doubledelta":
        f1 = np.array(
            [(it[5][1] - it[5][0]) & mask for _, it in with_f], dtype=np.uint64
        )
    _group_pass(
        mode, w, [it[0] for it in items], ns, plens, nbits_concat,
        payload_concat, f_pos, f0, f1, out,
    )


def decode_batch(blobs: list[bytes]) -> list[np.ndarray]:
    """Decode MANY SZ1 blobs with shared numpy passes.

    Compact-head blobs ('Z'/'Y', the small-chunk wire format) are parsed
    in vectorized passes over ONE concatenation of all blob bytes —
    heads, varints, RLE headers and zero-extension all come from global
    fancy indexing, so per-blob Python cost is a few list appends (the
    per-blob ``_parse`` loop was >40% of decode wall on ~40-row chunks,
    r10 profile). v1 heads, deflated blobs, per-blob-state modes
    (dyndelta/ewma/booldelta) and over-large headers take the legacy
    per-blob parse. Each (mode, width) group then decodes in one unpack
    + segmented-cumsum/FIRE pass. Returns arrays of the blob's stored
    unsigned dtype (callers .view()/offset as their meta dictates)."""
    out: list = [None] * len(blobs)
    batch: list = []
    scalar: list = []
    for i, buf in enumerate(blobs):
        b0 = buf[0]
        if (b0 == MAGIC2 or b0 == MAGIC3) and ((buf[1] >> 5) in _BATCH_MODES):
            batch.append(i)
        else:
            scalar.append(i)
    groups: dict = {}
    for i in scalar:
        buf = blobs[i]
        mode, w, n, pad, extra, nbits, payload, firsts = _parse(buf)
        if mode in ("dyndelta", "ewma", "booldelta"):  # per-blob state
            out[i] = decode_column(buf)
            continue
        groups.setdefault((mode, w), []).append(
            (i, n, pad, nbits, _zero_extend(payload, nbits), firsts)
        )
    if batch:
        _decode_compact_batch(blobs, batch, groups, out)
    for (mode, w), items in groups.items():
        _decode_items(mode, w, items, out)
    return out


def _decode_compact_batch(blobs, batch, groups, out) -> None:
    """Vectorized parse of 'Z'/'Y' compact-head blobs; feeds each
    (mode, w) group straight into _group_pass with gathered concat
    arrays. Over-large headers (> _BATCH_MAX_RUNS runs) fall back to the
    caller's ``groups`` dict (legacy per-blob parse)."""
    m = len(batch)
    L = np.fromiter((len(blobs[i]) for i in batch), np.int64, m)
    # trailing guard bytes: the 2-byte run-length varint read below
    # speculatively loads byte+1 even for 1-byte varints at a blob end
    big = np.frombuffer(
        b"".join([blobs[i] for i in batch] + [b"\x00\x00"]), np.uint8
    )
    offs = _cumsum0(L)[:-1]
    packed = big[offs + 1].astype(np.int64)
    mode_c = (packed >> 5).astype(np.int64)
    w_arr = np.array([8, 16, 32, 64], np.int64)[(packed >> 3) & 3]
    pads = (packed & 7).astype(np.int64)
    is_y = big[offs] == MAGIC3
    ns = (
        big[offs + 2].astype(np.int64)
        | (big[offs + 3].astype(np.int64) << 8)
    ) + is_y  # 'Y' stores n-1
    pos = (offs + 4).astype(np.int64)
    zz0 = np.zeros(m, np.uint64)
    zz1 = np.zeros(m, np.uint64)
    y_sel = np.flatnonzero(is_y)
    if len(y_sel):
        v, p = _uvarints_at(big, pos[y_sel])
        zz0[y_sel] = v
        pos[y_sel] = p
        dd_sel = y_sel[mode_c[y_sel] == 1]
        if len(dd_sel):
            v, p = _uvarints_at(big, pos[dd_sel])
            zz1[dd_sel] = v
            pos[dd_sel] = p
    nruns = np.zeros(m, np.int64)
    z_sel = np.flatnonzero(~is_y)
    if len(z_sel):
        nruns[z_sel] = big[pos[z_sel]]
        pos[z_sel] += 1
    if len(y_sel):
        v, p = _uvarints_at(big, pos[y_sel])
        nruns[y_sel] = v.astype(np.int64)
        pos[y_sel] = p
    # over-large headers -> legacy parse (bounded masked-pass loop below)
    for j in np.flatnonzero(nruns > _BATCH_MAX_RUNS):
        buf = blobs[batch[j]]
        mode, w, n, pad, extra, nbits, payload, firsts = _parse(buf)
        groups.setdefault((mode, w), []).append(
            (batch[j], n, pad, nbits, _zero_extend(payload, nbits), firsts)
        )
    keep = nruns <= _BATCH_MAX_RUNS
    if not keep.all():
        batch = [b for b, k in zip(batch, keep) if k]
        (L, offs, mode_c, w_arr, pads, is_y, ns, pos, zz0, zz1, nruns) = (
            L[keep], offs[keep], mode_c[keep], w_arr[keep], pads[keep],
            is_y[keep], ns[keep], pos[keep], zz0[keep], zz1[keep],
            nruns[keep],
        )
        m = len(batch)
    if not m:
        return
    # header run values: nruns[i] bytes at pos[i]
    total_runs = int(nruns.sum())
    run_base = _cumsum0(nruns)[:-1]
    within = np.arange(total_runs, dtype=np.int64) - np.repeat(run_base, nruns)
    run_vals = big[np.repeat(pos, nruns) + within]
    # run lengths: nruns[i] sequential varints (1-2 bytes, RUN_CAP bound)
    cur = pos + nruns
    run_lens = np.zeros(total_runs, np.int64)
    for k in range(int(nruns.max()) if m else 0):
        s = np.flatnonzero(nruns > k)
        b0 = big[cur[s]].astype(np.int64)
        two = (b0 & 0x80) != 0
        ln = np.where(
            two, (b0 & 0x7F) | (big[cur[s] + 1].astype(np.int64) << 7), b0
        )
        run_lens[run_base[s] + k] = ln
        cur[s] += 1 + two
    # per-blob block counts / expected+available payload bytes (BLOCK=8:
    # a b-bit block is exactly b payload bytes)
    rl_cum = _cumsum0(run_lens)
    nblocks = rl_cum[run_base + nruns] - rl_cum[run_base]
    exp_cum = _cumsum0(run_vals.astype(np.int64) * run_lens)
    exp_bytes = exp_cum[run_base + nruns] - exp_cum[run_base]
    avail = offs + L - cur
    nbits_all = np.repeat(run_vals, run_lens)
    blk_base = _cumsum0(nblocks)[:-1]
    # group by (mode, w) and gather each group's concat arrays
    for mc in np.unique(mode_c):
        mode = _MODE_NAMES[int(mc)]
        for w in np.unique(w_arr[mode_c == mc]):
            g = np.flatnonzero((mode_c == mc) & (w_arr == w))
            # nbits gather
            nb_g = nblocks[g]
            tot_b = int(nb_g.sum())
            gidx = np.arange(tot_b, dtype=np.int64) + np.repeat(
                blk_base[g] - _cumsum0(nb_g)[:-1], nb_g
            )
            nbits_g = nbits_all[gidx]
            # zero-extended payload gather: copy each blob's available
            # bytes into its expected-size slot (tail stays zero)
            av_g = avail[g]
            exp_g = exp_bytes[g]
            dst0 = _cumsum0(exp_g)[:-1]
            tot_av = int(av_g.sum())
            src = np.arange(tot_av, dtype=np.int64) + np.repeat(
                cur[g] - _cumsum0(av_g)[:-1], av_g
            )
            dst = np.arange(tot_av, dtype=np.int64) + np.repeat(
                dst0 - _cumsum0(av_g)[:-1], av_g
            )
            payload_g = np.zeros(int(exp_g.sum()), np.uint8)
            payload_g[dst] = big[src]
            # firsts ('Y' blobs with n > 0): unsigned bit patterns
            if w < 64:
                mask = np.uint64((1 << int(w)) - 1)
            else:
                mask = np.uint64(0xFFFFFFFFFFFFFFFF)
            f_pos = f0_u = f1_u = None
            if mode in ("delta", "doubledelta"):
                plens_g = ns[g] + pads[g]
                starts_g = _cumsum0(plens_g)[:-1]
                has_f = is_y[g] & (ns[g] > 0)
                f_pos = starts_g[has_f]
                zz0_g = zz0[g][has_f]
                f0_u = (
                    (zz0_g >> np.uint64(1))
                    ^ (np.uint64(0) - (zz0_g & np.uint64(1)))
                ) & mask
                if mode == "doubledelta":
                    zz1_g = zz1[g][has_f]
                    d1_u = (
                        (zz1_g >> np.uint64(1))
                        ^ (np.uint64(0) - (zz1_g & np.uint64(1)))
                    ) & mask
                    f1_u = (d1_u - f0_u) & mask
            _group_pass(
                mode, int(w), [batch[j] for j in g], ns[g], ns[g] + pads[g],
                nbits_g, payload_g, f_pos, f0_u, f1_u, out,
            )


def choose_mode(x: np.ndarray, candidates=("delta", "doubledelta", "fire")) -> str:
    """Cost-based per-column codec selection: argmin encoded size over the
    candidate pipelines (reference: CodecSearch, python/codec.py:439-535).
    Selection runs on a bounded sample for large columns."""
    x = np.asarray(x)
    sample = x[: 4096] if len(x) > 4096 else x
    w = x.dtype.itemsize * 8
    best, best_size = "delta", None
    for mode in candidates:
        if mode == "fire" and w not in (8, 16):
            continue
        size = len(encode_column(sample, mode))
        if best_size is None or size < best_size:
            best, best_size = mode, size
    return best


def _cumsum0(a: np.ndarray) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(a)])


def _pad_positions(ns: np.ndarray, pads: np.ndarray, dst_starts: np.ndarray) -> np.ndarray:
    """Indices of pad slots in the block-padded concat array."""
    sel = pads > 0
    p = pads[sel]
    if not len(p):
        return np.zeros(0, np.int64)
    base = dst_starts[:-1][sel] + ns[sel]
    intra = np.arange(int(p.sum()), dtype=np.int64) - np.repeat(_cumsum0(p)[:-1], p)
    return np.repeat(base, p) + intra


def _pad_concat(values: np.ndarray, ns: np.ndarray, su) -> tuple:
    """Scatter a concatenated segment array into a block-padded concat
    (each segment padded by repeating its last value) — all vectorized."""
    pads = (-ns) % BLOCK
    plens = ns + pads
    src_starts = _cumsum0(ns)
    dst_starts = _cumsum0(plens)
    v = values.view(su)
    u = np.zeros(int(dst_starts[-1]), dtype=su)
    if len(v):
        pos = np.arange(len(v), dtype=np.int64) + np.repeat(
            dst_starts[:-1] - src_starts[:-1], ns
        )
        u[pos] = v
        sel = (pads > 0) & (ns > 0)
        if sel.any():
            p = pads[sel]
            base = dst_starts[:-1][sel] + ns[sel]
            intra = np.arange(int(p.sum()), dtype=np.int64) - np.repeat(_cumsum0(p)[:-1], p)
            u[np.repeat(base, p) + intra] = np.repeat(v[src_starts[1:][sel] - 1], p)
    return u, pads, plens, dst_starts


def encode_batch_concat(
    values: np.ndarray, lengths: np.ndarray, mode: str | None = None, deflate: bool = True
) -> list[bytes]:
    """encode_batch over a single concatenated value array cut into
    segments of ``lengths`` — zero per-series array slicing. All padding,
    forecasting, packing and costing are global numpy passes; only the
    final per-series blob assembly is a Python loop of cheap slices."""
    values = np.asarray(values)
    if values.dtype.kind not in "iu":
        raise TypeError(f"encode_batch_concat takes integer arrays, got {values.dtype}")
    w = values.dtype.itemsize * 8
    su = _UNSIGNED[w]
    ns = np.asarray(lengths, dtype=np.int64)
    if mode == "fire":
        return encode_batch_concat_fire(values, ns, deflate)
    if mode in ("raw", "dyndelta", "ewma"):
        starts = _cumsum0(ns)
        return [
            encode_column(values[starts[i] : starts[i + 1]], mode, deflate)
            for i in range(len(ns))
        ]
    u, pads, plens, dst_starts = _pad_concat(values, ns, su)
    return _encode_padded_concat(u, ns, pads, plens, dst_starts, w, mode, deflate)


def encode_batch_concat_auto(
    values: np.ndarray, lengths: np.ndarray, deflate: bool = True
) -> list[bytes]:
    """Per-series argmin-size pick across delta/doubledelta AND fire —
    the batch analog of choose_mode's three-candidate cost selection
    (scalar path: operators/encode.py _encode_value_column). delta-vs-dd
    is decided inside _encode_padded_concat from shared block costs; the
    FIRE candidate is a real encode (fire_encode_multi batches across
    series) and wins per series on actual blob size, so e.g. quantized
    float columns whose residuals suit the adaptive filter get mode 3
    exactly like the scalar path would give them."""
    values = np.asarray(values)
    w = values.dtype.itemsize * 8
    base = encode_batch_concat(values, lengths, None, deflate)
    if w not in (8, 16):
        return base
    fireb = encode_batch_concat_fire(values, lengths, deflate)
    return [f if len(f) < len(b) else b for b, f in zip(base, fireb)]


def encode_batch_concat_fire(
    values: np.ndarray, lengths: np.ndarray, deflate: bool = True
) -> list[bytes]:
    """Batched FIRE encoding: the forecaster itself is per-segment (its
    coefficient state is sequential by design — reference:
    sprintz_xff_rle.cpp:203-275), but padding, bitwidth computation,
    packing, and blob assembly are shared global passes."""
    values = np.asarray(values)
    w = values.dtype.itemsize * 8
    if w not in (8, 16):
        raise ValueError("fire supports 8/16-bit elements only")
    su = _UNSIGNED[w]
    ns = np.asarray(lengths, dtype=np.int64)
    u, pads, plens, dst_starts = _pad_concat(values, ns, su)
    if len(ns) >= 8:
        # across-series vectorization wins for many series; for a few long
        # series the scalar per-block loop has less gather/scatter overhead
        z = fire.fire_encode_multi(u, dst_starts, plens, w)
        if len(z) == 0:
            z = np.zeros_like(u)
    else:
        z = np.empty_like(u)
        for i in range(len(ns)):
            lo, hi = dst_starts[i], dst_starts[i + 1]
            if hi > lo:
                z[lo:hi] = fire.fire_encode(u[lo:hi], w)
    if len(u):
        z[_pad_positions(ns, pads, dst_starts)] = 0  # match encode_column
    nb = bitpack.block_nbits(z, BLOCK) if len(u) else np.zeros(0, np.uint8)
    payload = bitpack.pack_blocks(z, nb, BLOCK) if len(u) else b""
    byte_off = _cumsum0(nb.astype(np.int64))
    blk_starts = (dst_starts[:-1] // BLOCK).astype(np.int64)
    blk_hi = blk_starts + plens // BLOCK
    pv = memoryview(payload)
    head_mid = bytes([MODES["fire"], w])
    f, f_hi, vb, lb, lo = _headers_batch(nb, blk_starts, blk_hi)
    nruns_arr = f_hi - f
    heads4 = np.empty((len(ns), 4), np.uint8)
    heads4[:, 0] = MAGIC2
    heads4[:, 1] = (
        np.uint8((MODES["fire"] << 5) | (_W_CODE[w] << 3)) | pads.astype(np.uint8)
    )
    nm = ns.astype(np.uint16)
    heads4[:, 2] = (nm & 0xFF).astype(np.uint8)
    heads4[:, 3] = (nm >> 8).astype(np.uint8)
    hb = heads4.tobytes()
    p_lo = byte_off[blk_starts]
    p_hi = _payload_ends(payload, p_lo, byte_off[blk_hi])
    compact = (ns < 65536) & (blk_hi - blk_starts <= 255)
    join = b"".join
    out = []
    for i in range(len(ns)):
        nruns = int(nruns_arr[i])
        i4 = 4 * i
        if compact[i]:
            blob = join((
                hb[i4 : i4 + 4], bytes([nruns]),
                vb[f[i] : f_hi[i]], lb[lo[f[i]] : lo[f_hi[i]]],
                pv[p_lo[i] : p_hi[i]],
            ))
        else:
            blob = join((
                MAGIC, head_mid, int(ns[i]).to_bytes(4, "little"),
                bytes([pads[i]]), b"\x00\x00", nruns.to_bytes(4, "little"),
                vb[f[i] : f_hi[i]], lb[lo[f[i]] : lo[f_hi[i]]],
                pv[p_lo[i] : p_hi[i]],
            ))
        out.append(_maybe_deflate(blob, deflate) if deflate else blob)
    return out


def _encode_padded_concat(u, ns, pads, plens, dst_starts, w, mode, deflate=True):
    su = _UNSIGNED[w]
    starts = dst_starts[:-1]
    nonempty = plens > 0
    s_idx = starts[nonempty]
    d1 = np.empty_like(u)
    if len(u):
        d1[0] = u[0]
        np.subtract(u[1:], u[:-1], out=d1[1:])
        d1[s_idx] = u[s_idx]
    d2 = np.empty_like(d1)
    if len(u):
        d2[0] = d1[0]
        np.subtract(d1[1:], d1[:-1], out=d2[1:])
        d2[s_idx] = u[s_idx]
        s1 = s_idx[plens[nonempty] > 1] + 1
        d2[s1] = d1[s1] - d1[s1 - 1]
    # out-of-band firsts ('Y' format): remember per-series x0 and first gap,
    # then zero those residual slots so the first block packs small
    elig = (ns >= 1) & (ns <= 65536)
    x0s = np.zeros(len(ns), dtype=su)
    gaps = np.zeros(len(ns), dtype=su)
    if len(u):
        x0s[nonempty] = u[s_idx]
        gaps[nonempty] = u[s_idx + 1] - u[s_idx]  # plens>=BLOCK when nonempty
    z1 = zigzag.encode(d1.view(_SIGNED[w]))
    z2 = zigzag.encode(d2.view(_SIGNED[w]))
    if len(u):
        e_idx = starts[elig & nonempty]
        z1[e_idx] = 0
        z2[e_idx] = 0
        z2[e_idx + 1] = 0
        z2[_pad_positions(ns, pads, dst_starts)] = 0  # match encode_column
    nb1 = bitpack.block_nbits(z1, BLOCK) if len(u) else np.zeros(0, np.uint8)
    nb2 = bitpack.block_nbits(z2, BLOCK) if len(u) else np.zeros(0, np.uint8)
    blk_starts = (starts // BLOCK).astype(np.int64)
    blk_lens = plens // BLOCK
    n_series = len(ns)
    if mode == "delta":
        choose2 = np.zeros(n_series, dtype=bool)
    elif mode == "doubledelta":
        choose2 = np.ones(n_series, dtype=bool)
    else:
        if len(nb1):
            idx = np.minimum(blk_starts, len(nb1) - 1)
            cost1 = np.add.reduceat(nb1.astype(np.int64), idx)
            cost2 = np.add.reduceat(nb2.astype(np.int64), idx)
            choose2 = cost2 < cost1
        else:
            choose2 = np.zeros(n_series, dtype=bool)
    blk_mask = np.repeat(choose2, blk_lens)
    nb = np.where(blk_mask, nb2, nb1).astype(np.uint8)
    samp_mask = np.repeat(choose2, plens)
    z = np.where(samp_mask, z2, z1)
    payload = bitpack.pack_blocks(z, nb, BLOCK) if len(u) else b""
    byte_off = _cumsum0(nb.astype(np.int64))
    out: list[bytes] = []
    pv = memoryview(payload)
    blk_hi = blk_starts + blk_lens
    mode_bytes = [bytes([MODES["delta"]]), bytes([MODES["doubledelta"]])]
    wb = bytes([w])
    zero16 = b"\x00\x00"
    mode_names = ["delta", "doubledelta"]
    f, f_hi, vb, lb, lo = _headers_batch(nb, blk_starts, blk_hi)
    nruns_arr = f_hi - f
    # vectorized compact heads ('Y'/'Z' share the 4-byte layout) and firsts
    # varints — byte-identical to _head3/_head2 per series
    packed = (
        (choose2.astype(np.uint8) << 5)
        | np.uint8(_W_CODE[w] << 3)
        | pads.astype(np.uint8)
    )
    nm = np.where(elig, ns - 1, ns).astype(np.uint16)
    heads4 = np.empty((n_series, 4), np.uint8)
    heads4[:, 0] = np.where(elig, MAGIC3, MAGIC2)
    heads4[:, 1] = packed
    heads4[:, 2] = (nm & 0xFF).astype(np.uint8)
    heads4[:, 3] = (nm >> 8).astype(np.uint8)
    hb = heads4.tobytes()
    vx_b, vx_off = rle.uvarint_batch(zigzag.encode(x0s).astype(np.uint64))
    vd_b, vd_off = rle.uvarint_batch(zigzag.encode(gaps).astype(np.uint64))
    small_run = nruns_arr < 128
    p_lo = byte_off[blk_starts]
    p_hi = _payload_ends(payload, p_lo, byte_off[blk_hi])
    compact_ok = (ns < 65536) & (blk_hi - blk_starts <= 255)
    join = b"".join
    for i in range(n_series):
        nruns = int(nruns_arr[i])
        i4 = 4 * i
        if elig[i]:
            blob = join((
                hb[i4 : i4 + 4],
                vx_b[vx_off[i] : vx_off[i + 1]],
                vd_b[vd_off[i] : vd_off[i + 1]] if choose2[i] else b"",
                bytes([nruns]) if small_run[i] else _uvarint(nruns),
                vb[f[i] : f_hi[i]], lb[lo[f[i]] : lo[f_hi[i]]],
                pv[p_lo[i] : p_hi[i]],
            ))
        elif compact_ok[i]:  # n==0 path
            blob = join((
                hb[i4 : i4 + 4], bytes([nruns]),
                vb[f[i] : f_hi[i]], lb[lo[f[i]] : lo[f_hi[i]]],
                pv[p_lo[i] : p_hi[i]],
            ))
        else:
            blob = join((
                MAGIC, mode_bytes[int(choose2[i])], wb,
                int(ns[i]).to_bytes(4, "little"), bytes([pads[i]]), zero16,
                nruns.to_bytes(4, "little"),
                vb[f[i] : f_hi[i]], lb[lo[f[i]] : lo[f_hi[i]]],
                pv[p_lo[i] : p_hi[i]],
            ))
        out.append(_maybe_deflate(blob, deflate) if deflate else blob)
    return out


def encode_batch(
    arrays: list[np.ndarray], mode: str | None = None
) -> list[bytes]:
    """Encode MANY series with one set of global numpy passes.

    The per-series wire format is identical to encode_column (decode_column
    reads each blob unchanged); only the computation is batched. See
    encode_batch_concat for the zero-copy variant used by the Spark UDFs.
    """
    if not arrays:
        return []
    for a in arrays:
        if np.asarray(a).dtype.kind not in "iu":
            raise TypeError(f"encode_batch takes integer arrays, got {a.dtype}")
    lengths = np.array([len(a) for a in arrays], dtype=np.int64)
    values = (
        np.concatenate([np.asarray(a) for a in arrays])
        if len(arrays) > 1
        else np.asarray(arrays[0])
    )
    return encode_batch_concat(values, lengths, mode)


_I64_MIN = np.iinfo(np.int64).min
_I64_MAX = np.iinfo(np.int64).max


def _run_partials_i64(
    nbits: np.ndarray,
    payload: bytes,
    ns: np.ndarray,
    x0s: np.ndarray,
    d1s: np.ndarray,
    mode: str,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-series (sum, max, min) from block headers WITHOUT unpacking
    zero-width blocks — the RLE-run fast path (reference:
    cpp/Compress/query.hpp:77-136 aggregates runs as func(v, prev, prev,
    ncopies); sprintz_delta_rle_query.hpp:272-311).

    Series are block-aligned (every encoder pads each series to a BLOCK
    multiple), so a series occupies whole blocks. Zero-width blocks carry
    no payload bytes at all; under delta they are constant runs
    (sum += value * run_len, one compare for max/min) and under
    doubledelta affine ramps (closed-form arithmetic-series sum, extremes
    at the endpoints). Only nonzero blocks are bit-unpacked. Cost is
    O(nonzero blocks + total blocks), not O(n).

    64-bit only: int64 wraparound arithmetic is bit-identical to the
    decoder's modular unsigned cumsum, so SUMS match decode+aggregate
    exactly even across +-2^63 wraps (the same element-width wraparound
    the reference's C kernels assume). MAX/MIN on doubledelta zero blocks
    take the ramp ENDPOINTS, which assumes the affine ramp is monotonic
    in int64 — a run whose values wrap past +-2^63 mid-block would report
    a different extreme than the decoder. Purely theoretical for this
    engine's domain (counters/sizes never approach 2^63); callers with
    adversarial inputs should force the decode path.

    ``ns``: true series lengths; ``x0s``: absolute first values (0 for
    in-stream-firsts blobs where the stream embeds x0); ``d1s``: first
    gaps for doubledelta out-of-band-firsts series (0 otherwise).
    """
    ns = np.asarray(ns, np.int64)
    n_series = len(ns)
    pads = (-ns) % BLOCK
    plens = ns + pads
    bps = plens // BLOCK  # blocks per series
    nblocks = len(nbits)
    b0 = _cumsum0(bps)[:-1]
    has_blocks = bps > 0
    sob = np.repeat(np.arange(n_series, dtype=np.int64), bps)  # series of block
    b0rep = np.repeat(b0, bps)
    nz = nbits > 0
    z = bitpack.unpack_blocks(payload, nbits[nz], np.uint64, BLOCK)
    e_nz = zigzag.decode(z).view(np.int64).reshape(-1, BLOCK)
    c_nz = e_nz.cumsum(axis=1)  # within-block cumsum of residuals
    S1 = np.zeros(nblocks, np.int64)
    if len(c_nz):
        S1[nz] = c_nz[:, -1]
    # valid samples per block: the final block of a padded series is short
    vc = np.full(nblocks, BLOCK, np.int64)
    short = has_blocks & (pads > 0)
    vc[(b0 + bps - 1)[short]] = BLOCK - pads[short]
    PS1 = np.cumsum(S1) - S1  # exclusive prefix of per-block residual sums
    bsum = np.empty(nblocks, np.int64)
    bmax = np.empty(nblocks, np.int64)
    bmin = np.empty(nblocks, np.int64)
    zb = ~nz
    cols = np.arange(BLOCK, dtype=np.int64)[None, :]
    if mode == "delta":
        # x[j] = x0 + cumsum(e)[j]; value entering block b is constant
        # across a zero block (the RLE constant run)
        x_in = x0s[sob] + PS1 - PS1[b0rep]
        bsum[zb] = vc[zb] * x_in[zb]
        bmax[zb] = x_in[zb]
        bmin[zb] = x_in[zb]
        if nz.any():
            xx = x_in[nz][:, None] + c_nz
            m = cols < vc[nz][:, None]
            bsum[nz] = np.where(m, xx, 0).sum(axis=1)
            bmax[nz] = np.where(m, xx, _I64_MIN).max(axis=1)
            bmin[nz] = np.where(m, xx, _I64_MAX).min(axis=1)
    elif mode == "doubledelta":
        # x = cumsum(cumsum(e)) + x0 + j*d1 (out-of-band firsts enter by
        # linear superposition). Block carries: d_in = first-diff entering
        # the block, X_in = value through the previous block.
        d_in = PS1 - PS1[b0rep]
        T = np.zeros(nblocks, np.int64)
        if len(c_nz):
            T[nz] = c_nz.sum(axis=1)
        inc = BLOCK * d_in + T  # x-advance contributed by each block
        PX = np.cumsum(inc) - inc
        X_in = PX - PX[b0rep]
        jb = (np.arange(nblocks, dtype=np.int64) - b0rep) * BLOCK
        slope = d_in + d1s[sob]  # per-sample advance inside a zero block
        v0 = X_in + d_in + x0s[sob] + jb * d1s[sob]  # value at block slot 0
        vz, s0, m0 = vc[zb], v0[zb], slope[zb]
        bsum[zb] = vz * s0 + m0 * (vz * (vz - 1) // 2)
        hi = s0 + (vz - 1) * m0
        bmax[zb] = np.maximum(s0, hi)
        bmin[zb] = np.minimum(s0, hi)
        if nz.any():
            C2 = c_nz.cumsum(axis=1)
            xx = (
                X_in[nz][:, None]
                + C2
                + (cols + 1) * d_in[nz][:, None]
                + x0s[sob[nz]][:, None]
                + (jb[nz][:, None] + cols) * d1s[sob[nz]][:, None]
            )
            m = cols < vc[nz][:, None]
            bsum[nz] = np.where(m, xx, 0).sum(axis=1)
            bmax[nz] = np.where(m, xx, _I64_MIN).max(axis=1)
            bmin[nz] = np.where(m, xx, _I64_MAX).min(axis=1)
    else:  # pragma: no cover
        raise ValueError(f"no run fast path for mode {mode}")
    sums = np.zeros(n_series, np.int64)
    maxs = np.full(n_series, _I64_MIN)
    mins = np.full(n_series, _I64_MAX)
    if has_blocks.any():
        idx0 = b0[has_blocks]
        sums[has_blocks] = np.add.reduceat(bsum, idx0)
        maxs[has_blocks] = np.maximum.reduceat(bmax, idx0)
        mins[has_blocks] = np.minimum.reduceat(bmin, idx0)
    return sums, maxs, mins


# Run fast path only when enough blocks are zero-width to pay for the
# block-level bookkeeping; below this the plain vectorized cumsum decode
# is faster (measured ~0.9x on run-free random walks, 4-10x on runs).
_RUN_FRACTION_MIN = 0.10


def _runs_worthwhile(nbits: np.ndarray) -> bool:
    return len(nbits) > 0 and (nbits == 0).sum() >= _RUN_FRACTION_MIN * len(nbits)


def _firsts_i64(firsts) -> tuple[int, int]:
    """(x0, d1) as int64 reinterpretations of the stored 64-bit patterns;
    (0, 0) for in-stream-firsts blobs."""
    if firsts is None:
        return 0, 0
    x0 = int(np.uint64(firsts[0]).astype(np.int64))
    d1 = int(np.uint64(firsts[1]).astype(np.int64)) if firsts[1] is not None else 0
    return x0, d1


def query_blob_partials(buf: bytes) -> tuple[int, int, int | None, int | None]:
    """(count, sum, max, min) of one blob, int64 value semantics.

    64-bit delta/doubledelta blobs take the RLE-run fast path
    (_run_partials_i64): zero-width blocks never touch payload bytes and
    aggregate in closed form. Other modes (fire/raw/dyndelta, narrow
    widths) decode fully — their residuals aren't run-structured.
    """
    mode, w, n, pad, extra, nbits, payload, firsts = _parse(buf)
    if n == 0:
        return 0, 0, None, None
    if w == 64 and mode in ("delta", "doubledelta") and _runs_worthwhile(nbits):
        x0, d1 = _firsts_i64(firsts)
        s, mx, mn = _run_partials_i64(
            nbits,
            _zero_extend(payload, nbits),
            np.array([n], np.int64),
            np.array([x0], np.int64),
            np.array([d1], np.int64),
            mode,
        )
        return n, int(s[0]), int(mx[0]), int(mn[0])
    vals = decode_column(buf).astype(np.int64)
    return n, int(vals.sum()), int(vals.max()), int(vals.min())


def query_batch_partials(
    blobs: list[bytes],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(counts, sums, maxs, mins) across many blobs. Fast-path-eligible
    blobs (64-bit delta/doubledelta) are concatenated per mode and share
    ONE unpack + block-level pass; the rest fall back to decode_batch."""
    n_b = len(blobs)
    cnts = np.zeros(n_b, np.int64)
    sums = np.zeros(n_b, np.int64)
    maxs = np.full(n_b, _I64_MIN)
    mins = np.full(n_b, _I64_MAX)
    fast: dict[str, list] = {}
    slow: list[int] = []
    for i, buf in enumerate(blobs):
        mode, w, n, pad, extra, nbits, payload, firsts = _parse(buf)
        cnts[i] = n
        if n == 0:
            continue
        if w == 64 and mode in ("delta", "doubledelta") and _runs_worthwhile(nbits):
            x0, d1 = _firsts_i64(firsts)
            fast.setdefault(mode, []).append(
                (i, n, nbits, _zero_extend(payload, nbits), x0, d1)
            )
        else:
            slow.append(i)
    for mode, items in fast.items():
        idx = np.array([it[0] for it in items], np.int64)
        nn = np.array([it[1] for it in items], np.int64)
        nb = np.concatenate([it[2] for it in items])
        pl = b"".join(it[3] for it in items)
        x0s = np.array([it[4] for it in items], np.int64)
        d1s = np.array([it[5] for it in items], np.int64)
        s, mx, mn = _run_partials_i64(nb, pl, nn, x0s, d1s, mode)
        sums[idx], maxs[idx], mins[idx] = s, mx, mn
    if slow:
        for i, arr in zip(slow, decode_batch([blobs[i] for i in slow])):
            v = arr.astype(np.int64)
            sums[i], maxs[i], mins[i] = int(v.sum()), int(v.max()), int(v.min())
    return cnts, sums, maxs, mins


def query_compressed(buf: bytes, op: str) -> int | None:
    """Fused aggregate over a compressed blob without materializing the
    series — the analog of the reference's query-on-compressed path
    (reference: cpp/Compress/query.hpp:22-296,
    sprintz_delta_rle_query.hpp:272-311).

    op in {'max', 'min', 'sum', 'count'}. 64-bit delta/doubledelta blobs
    use the RLE-run fast path (see _run_partials_i64): zero-width blocks
    contribute value*run_length to sums and one compare to max/min with
    no bit unpacking; only nonzero blocks touch payload. Other modes
    decode then aggregate. Values are int64 (wraparound-identical to the
    decoder).
    """
    if op == "count":
        mode, w, n, pad, extra, nbits, payload, _f = _parse(buf)
        return n
    n, s, mx, mn = query_blob_partials(buf)
    if op == "sum":
        return s
    if op == "max":
        return mx
    if op == "min":
        return mn
    raise ValueError(f"unknown op {op}")


def compressed_size_report(buf: bytes) -> dict:
    """Size accounting per section (for compression-ratio metrics)."""
    mode, w, n, pad, extra, nbits, payload, _firsts = _parse(buf)
    raw_bytes = n * (w // 8)
    return {
        "mode": mode,
        "w": int(w),
        "n": int(n),
        "raw_bytes": int(raw_bytes),
        "compressed_bytes": len(buf),
        "payload_bytes": len(payload),
        "ratio": (raw_bytes / len(buf)) if len(buf) else float("nan"),
        "zero_blocks": int((nbits == 0).sum()),
        "nblocks": int(len(nbits)),
    }


# --- multi-series container ('C') ------------------------------------------
#
# One blob for MANY series of one column (tier stores with tiny per-key
# series — e.g. the daily tier's 1-3-point series — would otherwise pay
# ~10-21 B of per-blob framing each). Per-series data shrinks to a varint
# length + varint zigzag first value(s); block headers and payload are
# shared across the whole container, and since every series' leading
# residuals and pad slots are zeroed, a 1-point series contributes zero
# payload bits. Layout:
#
#   'C' | mode(3b)|w_code(2b)|0 | uvarint n_series | uvarint n[i]... |
#   uvarint zz(x0[i])... [| uvarint zz(d1[i])... if doubledelta] |
#   uvarint nruns | run values u8[] | run lengths varint[] |
#   payload (trailing zeros stripped)

MAGIC_CONTAINER = 0x43  # b'C'


def encode_container(
    values: np.ndarray, lengths: np.ndarray, mode: str = "delta", deflate: bool = True
) -> bytes:
    """Encode many series (concatenated ``values`` cut by ``lengths``) of
    one column into ONE blob. mode: 'delta' | 'doubledelta' | 'auto'
    ('auto' cost-selects by summed block bitwidths before packing)."""
    if mode not in ("delta", "doubledelta", "auto"):
        raise ValueError("container supports delta/doubledelta/auto")
    values = np.asarray(values)
    if values.dtype.kind not in "iu":
        raise TypeError(f"encode_container takes integer arrays, got {values.dtype}")
    w = values.dtype.itemsize * 8
    su = _UNSIGNED[w]
    ns = np.asarray(lengths, dtype=np.int64)
    u, pads, plens, dst_starts = _pad_concat(values, ns, su)
    starts = dst_starts[:-1]
    nonempty = plens > 0
    s_idx = starts[nonempty]
    # residual stream with per-series restarts, firsts zeroed out-of-band
    d1 = np.empty_like(u)
    if len(u):
        d1[0] = u[0]
        np.subtract(u[1:], u[:-1], out=d1[1:])
        d1[s_idx] = u[s_idx]
    x0s = np.zeros(len(ns), dtype=su)
    gaps = np.zeros(len(ns), dtype=su)
    if len(u):
        x0s[nonempty] = u[s_idx]
        gaps[nonempty] = u[s_idx + 1] - u[s_idx]

    def _z_delta():
        z = zigzag.encode(d1.view(_SIGNED[w]))
        if len(u):
            z[s_idx] = 0
        return z

    def _z_dd():
        d2 = np.empty_like(d1)
        if len(u):
            d2[0] = d1[0]
            np.subtract(d1[1:], d1[:-1], out=d2[1:])
            s1 = s_idx[plens[nonempty] > 1] + 1
            d2[s1] = d1[s1] - d1[s1 - 1]
        z = zigzag.encode(d2.view(_SIGNED[w]))
        if len(u):
            z[s_idx] = 0
            z[s_idx + 1] = 0
            z[_pad_positions(ns, pads, dst_starts)] = 0
        return z

    if mode == "auto":
        z1, z2 = _z_delta(), _z_dd()
        nb1 = bitpack.block_nbits(z1, BLOCK) if len(u) else np.zeros(0, np.uint8)
        nb2 = bitpack.block_nbits(z2, BLOCK) if len(u) else np.zeros(0, np.uint8)
        # dd pays an extra varint per series for d1; compare payload+firsts
        cost1 = int(nb1.astype(np.int64).sum())
        cost2 = int(nb2.astype(np.int64).sum()) + len(ns)
        if cost2 < cost1:
            mode, z, nb = "doubledelta", z2, nb2
        else:
            mode, z, nb = "delta", z1, nb1
    elif mode == "doubledelta":
        z = _z_dd()
        nb = bitpack.block_nbits(z, BLOCK) if len(u) else np.zeros(0, np.uint8)
    else:
        z = _z_delta()
        nb = bitpack.block_nbits(z, BLOCK) if len(u) else np.zeros(0, np.uint8)
    payload = (bitpack.pack_blocks(z, nb, BLOCK) if len(u) else b"").rstrip(b"\x00")
    head = bytearray([MAGIC_CONTAINER, (MODES[mode] << 5) | (_W_CODE[w] << 3)])
    head += _uvarint(len(ns))
    for n in ns.tolist():
        head += _uvarint(int(n))
    for v in x0s.tolist():
        head += _uvarint(_zz_scalar(int(v), w))
    if mode == "doubledelta":
        for v in gaps.tolist():
            head += _uvarint(_zz_scalar(int(v), w))
    blob = bytes(head) + _headers_v(nb) + payload
    return _maybe_deflate(blob, deflate)


def _parse_container(buf: bytes):
    """Container head parse shared by decode and the query fast path:
    returns (mode, w, ns, x0s, gaps_or_None, nbits, payload)."""
    buf = _inflate(buf)
    assert buf[0] == MAGIC_CONTAINER, "bad container magic"
    packed = buf[1]
    mode = _MODE_NAMES[packed >> 5]
    w = _W_FROM_CODE[(packed >> 3) & 0x3]
    su = _UNSIGNED[w]
    pos = 2
    n_series, pos = _read_uvarint(buf, pos)
    ns = np.empty(n_series, dtype=np.int64)
    for i in range(n_series):
        ns[i], pos = _read_uvarint(buf, pos)
    x0s = np.empty(n_series, dtype=su)
    for i in range(n_series):
        v, pos = _read_uvarint(buf, pos)
        x0s[i] = su(_unzz_scalar(v, w))
    gaps = None
    if mode == "doubledelta":
        gaps = np.empty(n_series, dtype=su)
        for i in range(n_series):
            v, pos = _read_uvarint(buf, pos)
            gaps[i] = su(_unzz_scalar(v, w))
    nruns, pos = _read_uvarint(buf, pos)
    nbits, used = rle.decode_headers(nruns.to_bytes(4, "little") + buf[pos:])
    payload = _zero_extend(buf[pos + used - 4 :], nbits)
    return mode, w, ns, x0s, gaps, nbits, payload


def query_container_partials(
    buf: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-series (counts, sums, maxs, mins) straight from a container blob.

    Container series are individually block-padded, so each series owns
    whole blocks and the RLE-run fast path applies per series: the tiny
    constant-heavy daily-tier series aggregate from headers alone."""
    mode, w, ns, x0s, gaps, nbits, payload = _parse_container(buf)
    if w == 64 and mode in ("delta", "doubledelta") and _runs_worthwhile(nbits):
        x0_i = x0s.view(np.int64)
        d1_i = gaps.view(np.int64) if gaps is not None else np.zeros(len(ns), np.int64)
        sums, maxs, mins = _run_partials_i64(nbits, payload, ns, x0_i, d1_i, mode)
        return ns, sums, maxs, mins
    vals, ns = decode_container(buf)  # narrow widths: no fast path
    v = vals.astype(np.int64)
    starts = _cumsum0(ns)[:-1]
    return (
        ns,
        np.add.reduceat(v, starts),
        np.maximum.reduceat(v, starts),
        np.minimum.reduceat(v, starts),
    )


def decode_container(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_container: (values_concat, lengths)."""
    mode, w, ns, x0s, gaps, nbits, payload = _parse_container(buf)
    su = _UNSIGNED[w]
    mask = (1 << w) - 1
    pads = (-ns) % BLOCK
    plens = ns + pads
    dst_starts = _cumsum0(plens)
    starts = dst_starts[:-1]
    nonempty = plens > 0
    s_idx = starts[nonempty]
    z = bitpack.unpack_blocks(payload, nbits, su, BLOCK)
    d = zigzag.decode(z).view(su)
    if len(d):
        d[s_idx] = x0s[nonempty]
        if mode == "doubledelta":
            # unsigned subtraction wraps mod 2^w — the residual-domain d1-x0
            d[s_idx + 1] = gaps[nonempty] - x0s[nonempty]
    x = _segmented_cumsum(d, s_idx, plens[nonempty]) if len(d) else d
    if mode == "doubledelta" and len(d):
        x = _segmented_cumsum(x, s_idx, plens[nonempty])
    # drop pad slots
    if pads.any():
        keep = np.ones(len(x), dtype=bool)
        keep[_pad_positions(ns, pads, dst_starts)] = False
        x = x[keep]
    return x, ns
