"""CodecSearch: try K codec pipelines per column, keep the smallest
(reference: python/codec.py:439-535 CodecSearch; pipeline set mirrors
python/main_dfsqueeze.py:53-80 — combinations of quantize, delta variants,
byte shuffle, and general-purpose byte codecs).

Container format: u8 pipeline-id | u8 dtype-code | u32 n | payload.
``search_encode`` is the max-ratio path (try-all, data-dependent);
the hot path remains sprintz.encode_batch_concat's cheap delta/dd cost
model. Pipelines always round-trip exactly (tests sweep the reference's
input families).
"""

from __future__ import annotations

import numpy as np

from sprintz_spark.codecs import extras, gorilla
from sprintz_spark.codecs import sprintz as sz

_DTYPES = [np.uint8, np.uint16, np.uint32, np.uint64,
           np.int8, np.int16, np.int32, np.int64, np.float64]
_DTYPE_CODE = {np.dtype(d): i for i, d in enumerate(_DTYPES)}


def _sz(mode):
    return (
        lambda x: sz.encode_column(x, mode),
        lambda b, dt, n: sz.decode_column(b).view(dt),
    )


def _bzip2():
    return (
        extras.bzip2_encode,
        lambda b, dt, n: extras.bzip2_decode(b, dt),
    )


def _shuffle_lzma():
    return (
        lambda x: extras.lzma_encode(extras.byteshuffle_encode(x)),
        lambda b, dt, n: extras.byteshuffle_decode(
            extras.lzma_decode(b, np.uint8), dt, n
        ),
    )


def _shuffle_zstd():
    return (
        lambda x: extras.zstd_encode(extras.byteshuffle_encode(x)),
        lambda b, dt, n: extras.byteshuffle_decode(
            extras.zstd_decode(b, np.uint8), dt, n
        ),
    )


def _huffman():
    from sprintz_spark.codecs import huffman as hf

    return (
        lambda x: hf.huffman_encode(x.view(np.uint8)),
        lambda b, dt, n: hf.huffman_decode(b).view(dt),
    )


def _shuffle_huffman():
    from sprintz_spark.codecs import huffman as hf

    return (
        lambda x: hf.huffman_encode(extras.byteshuffle_encode(x)),
        lambda b, dt, n: extras.byteshuffle_decode(hf.huffman_decode(b), dt, n),
    )


def _gorilla():
    return (
        lambda x: gorilla.encode(x.astype(np.float64, copy=False)),
        lambda b, dt, n: gorilla.decode(b).astype(dt, copy=False),
    )


# APPEND-ONLY: the list index is the on-disk pipeline id (byte 0 of the
# search container), so existing entries must never be reordered or
# removed — new pipelines go at the END. (Round-2 briefly inserted
# entries mid-list; restored to the original prefix + appended tail.)
PIPELINES: list[tuple[str, tuple]] = [
    ("sprintz-delta", _sz("delta")),
    ("sprintz-doubledelta", _sz("doubledelta")),
    ("sprintz-dyndelta", _sz("dyndelta")),
    ("sprintz-fire", _sz("fire")),  # u8/u16 only; skipped otherwise
    ("raw", _sz("raw")),
    ("bzip2", _bzip2()),
    ("byteshuffle-lzma", _shuffle_lzma()),
    ("gorilla", _gorilla()),  # float64 only
    ("sprintz-ewma", _sz("ewma")),  # u8/u16 only (online.hpp moving avg)
    ("byteshuffle-zstd", _shuffle_zstd()),  # true zstd when importable
    ("huffman", _huffman()),  # canonical Huffman (the paper's entropy stage)
    ("byteshuffle-huffman", _shuffle_huffman()),
]

# ewma's IIR scan is per-sample Python (no per-block state boundary, so it
# cannot batch like FIRE); cap the column length it may win at so a probe
# victory can't commit the full column to a sample-by-sample encode
EWMA_MAX_LEN = 1 << 17


def search_encode(
    x: np.ndarray, sample: int = 1 << 16, pipeline: str | None = None
) -> bytes:
    """Try every applicable pipeline (on a bounded sample for very long
    columns, then encode fully with the winner); return the container.
    ``pipeline`` forces a named pipeline instead of probing (used by
    tests/queries that gate one codec end-to-end)."""
    x = np.ascontiguousarray(x)
    dt = x.dtype
    is_float = dt.kind == "f"
    w = dt.itemsize * 8
    if pipeline is not None:
        names = [n for n, _ in PIPELINES]
        best_i = names.index(pipeline)
        enc, _dec = PIPELINES[best_i][1]
        payload = enc(x)
        head = bytes([best_i, _DTYPE_CODE[dt]]) + np.uint32(len(x)).tobytes()
        return head + payload
    probe = x[:sample] if len(x) > sample else x
    best_i, best_size = None, None
    for i, (name, (enc, _dec)) in enumerate(PIPELINES):
        if name == "gorilla" and not is_float:
            continue
        if name != "gorilla" and is_float:
            continue
        if name in ("sprintz-fire", "sprintz-ewma") and w not in (8, 16):
            continue
        if name == "sprintz-ewma" and len(x) > EWMA_MAX_LEN:
            continue  # per-sample scan: ineligible for long columns
        try:
            size = len(enc(probe))
        except (TypeError, ValueError):
            continue
        if best_size is None or size < best_size:
            best_i, best_size = i, size
    enc, _dec = PIPELINES[best_i][1]
    payload = enc(x)
    head = bytes([best_i, _DTYPE_CODE[dt]]) + np.uint32(len(x)).tobytes()
    return head + payload


def search_decode(buf: bytes) -> np.ndarray:
    pipeline_i = buf[0]
    dt = np.dtype(_DTYPES[buf[1]])
    n = int(np.frombuffer(buf[2:6], dtype=np.uint32)[0])
    _name, (_enc, dec) = PIPELINES[pipeline_i]
    return dec(buf[6:], dt, n)


def search_report(x: np.ndarray) -> dict:
    """Size of every applicable pipeline — the encode-measure harness
    (reference: python/dfsqueeze.py encode_measure_decode)."""
    out = {}
    for name, (enc, dec) in PIPELINES:
        try:
            buf = enc(x)
            out[name] = len(buf)
        except (TypeError, ValueError):
            continue
    out["raw_bytes"] = x.nbytes
    return out
