"""Sprintz encode/decode of bucketed series as Arrow-batched Spark UDFs.

Maps the reference's dataframe-compression pipeline (reference:
python/dfsqueeze.py:15-231 encode→measure→decode→verify; codec selection
python/codec.py:439-535) onto Spark:

  * ``encode_series``: groupBy(key) → applyInPandas; inside each group the
    series is sorted by bucket, split into bounded chunks, and every value
    column goes through quantize → per-column cost-based mode selection
    (delta / doubledelta / fire / raw; fire only for u8/u16, like the
    reference's C core) → SZ1 block format. Timestamps get delta-of-delta.
    Float columns that defeat the decimal quantizer fall back to Gorilla
    XOR. Output: ONE ROW PER (key, chunk) with binary blobs + metrics.
  * ``decode_series``: mapInPandas — decoding needs no shuffle at all;
    each encoded row explodes back to its original rows, exactly.
  * ``query_encoded``: fused decode+aggregate (reference query-on-
    compressed, cpp/Compress/query.hpp) — mapInPandas emits per-chunk
    partials straight from the blobs, Catalyst's partial+final aggregate
    combines. Never materializes the decoded table.
  * ``encode_series_container``/``decode_series_container``/
    ``query_encoded_container``: the multi-series 'C' format — one blob
    per (partition, column) holding ALL series of the slice, so output
    rows/files are O(partitions) not O(keys) and tiny series cost a few
    bytes each. The retention tier store uses this by default.

Scale notes: group state is O(chunk) not O(series); chunk_rows bounds
executor memory; a year of 1-minute buckets per url is ~525k rows → a few
chunks. Hot urls are bounded by the time axis, not crawl count, because
encoding happens AFTER rollup.
"""

from __future__ import annotations

import json
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from sprintz_spark.codecs import gorilla
from sprintz_spark.codecs import quantize as Q
from sprintz_spark.codecs import sprintz as sz

try:  # C JSON parser if present — chunk metas are parsed once per blob
    from orjson import loads as _json_loads  # type: ignore
except ImportError:  # pragma: no cover - environment-dependent
    _json_loads = json.loads

DEFAULT_CHUNK = 1 << 16


def _raw_itemsize(dtype) -> int:
    """True raw element width in bytes for ratio accounting (bool = 1,
    floats/ints = their width). Resolves pandas extension dtypes
    (nullable BooleanDtype, arrow-backed bool, Int64Dtype, ...) via
    their numpy counterpart so a nullable bool costs 1 raw byte, not a
    flat 8 (a flat 8 overstated booldelta compression ratios 8x)."""
    try:
        return int(np.dtype(dtype).itemsize) or 8
    except TypeError:
        npdt = getattr(dtype, "numpy_dtype", None)
        if npdt is not None:
            try:
                return int(np.dtype(npdt).itemsize) or 8
            except TypeError:
                pass
        if getattr(dtype, "kind", "") == "b":
            return 1
        return 8  # object dtypes land on floats


def _encode_value_column(s: pd.Series, force: str | None = None) -> tuple[bytes, dict]:
    """quantize → mode search → SZ1; fallback to gorilla for floats.

    ``force``: 'gorilla' bypasses the quantizer (Gorilla XOR float codec),
    'quantize' requires the decimal quantizer to succeed (raises otherwise),
    'search' routes through the CodecSearch max-ratio container (reference
    python/codec.py:439-535), 'search:NAME' forces that one pipeline
    (e.g. 'search:huffman' for the canonical-Huffman entropy stage), and
    'search!NAME[,NAME...]' probes with the named pipelines excluded
    (used by environment-pinned goldens to drop backend-dependent
    pipelines — see codecs.search.search_encode).
    """
    if force == "gorilla":
        return gorilla.encode(s.to_numpy(np.float64)), {"codec": "gorilla"}
    if force == "booldelta":
        from sprintz_spark.codecs.extras import bool_to_categorical_encode

        codes, nullable = bool_to_categorical_encode(s)
        # nullable flags the INPUT DTYPE; only actual NAs (code 2) are
        # unrepresentable here — a null-free nullable-boolean series
        # (arrow-backed pandas produces these) encodes fine
        if nullable and (codes == 2).any():
            raise ValueError("booldelta series path takes non-null booleans")
        return (
            sz.encode_column(codes, "booldelta"),
            {"codec": "sprintz", "mode": "booldelta", "np_dtype": "uint8",
             "bool": True},
        )
    if force is not None and force.startswith("search"):
        from sprintz_spark.codecs import search as CS

        excl = tuple(x for x in force.partition("!")[2].split(",") if x)
        name = force.partition(":")[2] or None
        return (
            CS.search_encode(s.to_numpy(), pipeline=name, exclude=excl),
            {"codec": "search"},
        )
    kind = s.dtype.kind
    if kind in "iu" and not s.isna().any():
        vals = s.to_numpy()
        width = vals.dtype.itemsize * 8
        u, qp = None, None
        if width == 64:
            arr = vals.astype(np.int64)
        else:
            arr = vals
    else:
        try:
            u, qp = Q.quantize(s)
            arr = u
        except (ValueError, TypeError):
            if force == "quantize":
                raise
            buf = gorilla.encode(s.to_numpy(np.float64))
            return buf, {"codec": "gorilla"}
    candidates = ("delta", "doubledelta", "fire", "raw") if arr.dtype.itemsize <= 2 else (
        "delta", "doubledelta", "raw")
    mode = sz.choose_mode(arr, candidates)
    meta = {"codec": "sprintz", "mode": mode, "np_dtype": str(arr.dtype)}
    if qp is not None:
        meta["qparams"] = qp.to_dict()
    return sz.encode_column(arr, mode), meta


def _decode_value_column(buf: bytes, meta: dict) -> pd.Series:
    if meta["codec"] == "gorilla":
        return pd.Series(gorilla.decode(buf))
    if meta["codec"] == "search":
        from sprintz_spark.codecs import search as CS

        # the retention read path may face pre-v1 stores: explicitly opt
        # into the legacy 6-byte-header format (see search_decode)
        return pd.Series(CS.search_decode(buf, allow_legacy=True))
    u = sz.decode_column(buf)
    arr = u.view(np.dtype(meta["np_dtype"]))
    if "qparams" in meta:
        return Q.unquantize(arr.view(np.dtype(meta["qparams"]["dtype"])),
                            Q.QuantizeParams.from_dict(meta["qparams"]))
    if "offset" in meta:  # narrow-width offset quantization (FIRE path)
        return pd.Series(arr.astype(np.int64) + np.int64(meta["offset"]))
    if meta.get("bool"):
        return pd.Series(arr.view(bool))
    return pd.Series(arr)


def _transform_decoded(arr: np.ndarray, meta: dict) -> np.ndarray | pd.Series:
    """Apply a blob's meta transform to a decode_batch output array."""
    if meta["codec"] == "gorilla":  # pragma: no cover - handled per blob
        raise ValueError("gorilla blobs are not SZ1 decode_batch outputs")
    out = arr.view(np.dtype(meta["np_dtype"]))
    if "qparams" in meta:
        return Q.unquantize(
            out.view(np.dtype(meta["qparams"]["dtype"])),
            Q.QuantizeParams.from_dict(meta["qparams"]),
        )
    if "offset" in meta:
        return out.astype(np.int64) + np.int64(meta["offset"])
    if meta.get("bool"):
        return out.view(bool)
    return out


def decode_value_columns_batch(
    blobs: list[bytes], metas: list[dict]
) -> list[np.ndarray | pd.Series]:
    """Batched decode of one value column across many chunks; gorilla blobs
    fall back to the per-blob path, everything else (including quantized
    chunks — unquantize is a cheap per-chunk numpy transform applied to the
    batch-decoded array) shares decode_batch's global passes."""
    simple_idx = [i for i, m in enumerate(metas) if m["codec"] == "sprintz"]
    out: list = [None] * len(blobs)
    if simple_idx:
        decoded = sz.decode_batch([blobs[i] for i in simple_idx])
        # the narrow-width offset transform (FIRE path) is batched per
        # dtype: one concat + one astype + one repeated add across ALL
        # such blobs, then views split back — the per-blob
        # astype-and-add was ~5 us per tiny chunk, dominating decode of
        # short-series stores (r10 measurement)
        off_groups: dict[str, list[int]] = {}
        for j, i in enumerate(simple_idx):
            m = metas[i]
            if "offset" in m and "qparams" not in m and not m.get("bool"):
                off_groups.setdefault(m["np_dtype"], []).append(j)
            else:
                out[i] = _transform_decoded(decoded[j], m)
        for dt, js in off_groups.items():
            npdt = np.dtype(dt)
            arrs = [decoded[j].view(npdt) for j in js]
            lens = np.fromiter((len(a) for a in arrs), np.int64, len(arrs))
            offs = np.fromiter(
                (metas[simple_idx[j]]["offset"] for j in js), np.int64, len(js)
            )
            big = np.concatenate(arrs).astype(np.int64) if arrs else np.zeros(0, np.int64)
            big += np.repeat(offs, lens)
            bounds = np.concatenate([[0], np.cumsum(lens)])
            for k, j in enumerate(js):
                out[simple_idx[j]] = big[bounds[k] : bounds[k + 1]]
    search_idx = [
        i for i, m in enumerate(metas) if out[i] is None and m["codec"] == "search"
    ]
    if search_idx:
        from sprintz_spark.codecs import search as CS

        # batched container dispatch (r10): sprintz-family payloads share
        # decode_batch's global passes, huffman payloads the lockstep
        # batch decoder — the retention read path may face pre-v1
        # stores, hence allow_legacy (same as _decode_value_column)
        arrs = CS.search_decode_batch(
            [blobs[i] for i in search_idx], allow_legacy=True
        )
        for i, a in zip(search_idx, arrs):
            out[i] = np.asarray(a)
    for i, m in enumerate(metas):
        if out[i] is None:
            out[i] = _decode_value_column(blobs[i], m).to_numpy()
    return out


_UINT_BY_W = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def _encode_float_batch(
    vals: np.ndarray,
    piece_starts: np.ndarray,
    piece_lens: np.ndarray,
    orig_dtype: str,
) -> tuple[list, list] | None:
    """Batched per-piece decimal quantization + sprintz encode for a plain
    float column — the vectorized analog of quantize()+encode_column per
    piece (identical semantics: same scale inference, offset, dtype choice,
    NaN sentinel; verified by the round-trip tests). Pieces that defeat the
    quantizer (no decimal scale, span > u64, all-NaN, |x| >= 2^53) return
    None in their slot so the caller can fall back per piece."""
    n_pieces = len(piece_starts)
    vals = vals.astype(np.float64, copy=False)
    nonfinite = ~np.isfinite(vals)
    clean = np.where(nonfinite, 0.0, vals)
    nf_cnt = np.add.reduceat(nonfinite.astype(np.int64), piece_starts)
    allfinite = nf_cnt == 0
    n_finite = piece_lens - nf_cnt
    ok = n_finite > 0
    ok &= np.maximum.reduceat(np.abs(clean), piece_starts) < 2.0**53
    # per-piece smallest 10^k (k<=6) making all finite values integral,
    # with the same exact-roundtrip check as quantize._infer_scale
    scales = np.full(n_pieces, np.nan)
    pending = ok.copy()
    for k in range(Q.MAX_SCALE_EXP + 1):
        if not pending.any():
            break
        scale = 10.0**k
        scaled = clean * scale
        r = np.round(scaled)
        viol = (np.abs(scaled - r) > 1e-9) | (r / scale != clean)
        viol &= ~nonfinite
        bad = np.add.reduceat(viol.astype(np.int64), piece_starts) > 0
        hit = pending & ~bad
        scales[hit] = scale
        pending &= bad
    ok &= np.isfinite(scales)
    if not ok.any():
        return None
    scale_el = np.repeat(np.where(ok, np.nan_to_num(scales, nan=1.0), 1.0), piece_lens)
    scaled_int = np.round(clean * scale_el)
    inf_hi = np.where(nonfinite, np.inf, scaled_int)
    inf_lo = np.where(nonfinite, -np.inf, scaled_int)
    mins = np.minimum.reduceat(inf_hi, piece_starts)
    maxs = np.maximum.reduceat(inf_lo, piece_starts)
    spans = np.where(ok, maxs - mins, 0.0)
    need_sent = (~allfinite).astype(np.int64)
    width = np.full(n_pieces, 64, np.int64)
    for w in (32, 16, 8):
        hi = float(np.iinfo(_UINT_BY_W[w]).max)
        width = np.where(spans <= hi - need_sent, w, width)
    ok &= spans <= float(np.iinfo(np.uint64).max) - need_sent
    u_all = scaled_int - np.repeat(np.where(ok, np.nan_to_num(mins, nan=0.0), 0.0), piece_lens)
    u_all[nonfinite] = 0.0  # sentinel applied after the uint cast (as quantize())
    blobs: list = [None] * n_pieces
    metas: list = [None] * n_pieces
    for w in (8, 16, 32, 64):
        dt = _UINT_BY_W[w]
        sel = np.flatnonzero(ok & (width == w))
        if not len(sel):
            continue
        lens_w = piece_lens[sel]
        tot = int(lens_w.sum())
        off0 = np.concatenate([[0], np.cumsum(lens_w)[:-1]])
        gather = np.arange(tot, dtype=np.int64) + np.repeat(piece_starts[sel] - off0, lens_w)
        sub = u_all[gather].astype(dt)
        nf_sub = nonfinite[gather]
        if nf_sub.any():
            sub[nf_sub] = np.iinfo(dt).max
        # three-way cost pick (delta/dd/fire) for narrow widths — the
        # same candidate set the scalar path's choose_mode considers
        bl = sz.encode_batch_concat_auto(sub, lens_w)
        for j, i in enumerate(sel):
            qp = Q.QuantizeParams(
                str(np.dtype(dt)),
                float(mins[i]),
                float(scales[i]),
                orig_dtype,
                bool(allfinite[i]),
                int(piece_lens[i]),
            )
            blobs[i] = bl[j]
            metas[i] = {
                "codec": "sprintz",
                "mode": sz.blob_mode(bl[j]),
                "np_dtype": str(np.dtype(dt)),
                "qparams": qp.to_dict(),
            }
    return blobs, metas


def _enc_schema(key_cols: list[str], value_cols: list[str], key_types) -> StructType:
    fields = [StructField(k, t) for k, t in zip(key_cols, key_types)]
    fields += [
        StructField("chunk", LongType()),
        StructField("start_bucket", TimestampType()),
        StructField("end_bucket", TimestampType()),
        StructField("n", LongType()),
        StructField("ts_blob", BinaryType()),
        StructField("meta", StringType()),
        StructField("raw_bytes", LongType()),
        StructField("comp_bytes", LongType()),
        StructField("encode_secs", DoubleType()),
    ]
    fields += [StructField(f"blob_{c}", BinaryType()) for c in value_cols]
    return StructType(fields)


def encode_series(
    df: DataFrame,
    key_cols: list[str] = ("url",),
    ts_col: str = "bucket",
    value_cols: list[str] = ("crawl_count", "byte_size_sum", "byte_size_max"),
    chunk_rows: int = DEFAULT_CHUNK,
    part_col: str | None = None,
    n_parts: int | None = None,
    codecs: dict | None = None,
) -> DataFrame:
    """One output row per (series, chunk).

    Physical grouping is by a hash partition (``part_col`` if given, else a
    derived one), NOT per series: one Arrow batch carries many series and
    the per-series loop happens pandas-side. This keeps applyInPandas
    group count == shuffle partition count — per-group Arrow overhead is
    amortized over thousands of series, which is also the correct shape at
    100 TB (bounded group memory, no million-group scheduling)."""
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    spark = df.sparkSession
    drop_part = part_col is None
    if part_col is None:
        part_col = "_enc_part"
        n_parts = n_parts or spark.sparkContext.defaultParallelism * 2
        df = df.withColumn(
            part_col, F.pmod(F.xxhash64(*key_cols), F.lit(n_parts)).cast("int")
        )
    if n_parts:
        # explicit repartition-by-NUM pins the encode stage's task count:
        # the groupBy exchange alone lets AQE coalesce by BYTES, and the
        # probe/pack kernels are CPU-bound per row, not per byte — at
        # sf0.1 AQE squeezed the whole codec-search encode onto ONE task
        # (5.6 s wall vs 0.9 s pinned, r10 A/B). AQE never coalesces a
        # user-specified numbered repartition, and the hash partitioning
        # satisfies the groupBy requirement so no second exchange
        # appears. n_parts stays scale-adaptive (defaultParallelism*2).
        df = df.repartition(n_parts, part_col)
    key_types = [df.schema[k].dataType for k in key_cols]
    out_keys = ([] if drop_part else [part_col]) + key_cols
    out_key_types = (
        [] if drop_part else [df.schema[part_col].dataType]
    ) + key_types
    schema = _enc_schema(out_keys, value_cols, out_key_types)

    col_names = [f.name for f in schema.fields]

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(columns=col_names)
        # one vectorized sort, then pure-numpy segmentation: series
        # boundaries from key-change points, chunk pieces by arithmetic —
        # no per-series pandas objects anywhere
        pdf = pdf.sort_values(key_cols + [ts_col], kind="mergesort").reset_index(
            drop=True
        )
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for k in key_cols:
            a = pdf[k].to_numpy()
            change[1:] |= a[1:] != a[:-1]
        s_starts = np.flatnonzero(change)
        s_lens = np.diff(np.append(s_starts, n))
        reps = (s_lens + chunk_rows - 1) // chunk_rows
        piece_series = np.repeat(np.arange(len(s_starts)), reps)
        piece_ord = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
        )
        piece_starts = s_starts[piece_series] + piece_ord * chunk_rows
        piece_lens = np.minimum(chunk_rows, s_lens[piece_series] - piece_ord * chunk_rows)
        n_pieces = len(piece_starts)

        ts_np = pdf[ts_col].astype("datetime64[us]").to_numpy()
        ts_blobs = sz.encode_batch_concat(ts_np.view(np.int64), piece_lens, "doubledelta")
        raws = piece_lens * 8
        comps = np.fromiter((len(b) for b in ts_blobs), np.int64, n_pieces)
        col_metas: dict[str, list] = {}
        col_blobs: dict[str, list] = {}
        for c in value_cols:
            s = pdf[c]
            force = (codecs or {}).get(c)
            if force is None and s.dtype.kind in "iu":
                blobs = sz.encode_batch_concat(s.to_numpy(), piece_lens, None)
                dt = str(s.dtype)
                metas_c = [
                    {"codec": "sprintz", "mode": sz.blob_mode(b), "np_dtype": dt}
                    for b in blobs
                ]
                raws = raws + s.dtype.itemsize * piece_lens
            else:
                blobs = metas_c = None
                if force != "gorilla" and s.dtype.kind == "f":
                    res = _encode_float_batch(
                        s.to_numpy(), piece_starts, piece_lens, str(s.dtype)
                    )
                    if res is not None:
                        blobs, metas_c = res
                        for i in range(n_pieces):  # quantizer-defeating pieces
                            if blobs[i] is None:
                                st, ln = piece_starts[i], piece_lens[i]
                                blobs[i], metas_c[i] = _encode_value_column(
                                    s.iloc[st : st + ln], force
                                )
                if blobs is None:
                    blobs, metas_c = [], []
                    for st, ln in zip(piece_starts, piece_lens):
                        blob, m = _encode_value_column(s.iloc[st : st + ln], force)
                        blobs.append(blob)
                        metas_c.append(m)
                itemsize = _raw_itemsize(s.dtype)
                raws = raws + itemsize * piece_lens
            comps = comps + np.fromiter((len(b) for b in blobs), np.int64, n_pieces)
            col_blobs[c] = blobs
            col_metas[c] = metas_c
        wall = time.perf_counter() - t0
        out = pd.DataFrame(
            {k: pdf[k].to_numpy()[piece_starts] for k in out_keys}
        )
        out["chunk"] = piece_ord
        out["start_bucket"] = ts_np[piece_starts]
        out["end_bucket"] = ts_np[piece_starts + piece_lens - 1]
        out["n"] = piece_lens
        out["ts_blob"] = ts_blobs
        ts_meta = {"ts": {"codec": "sprintz", "mode": "doubledelta"}}
        out["meta"] = [
            json.dumps({**ts_meta, **{c: col_metas[c][i] for c in value_cols}})
            for i in range(n_pieces)
        ]
        out["raw_bytes"] = raws
        out["comp_bytes"] = comps
        out["encode_secs"] = wall / n_pieces
        for c in value_cols:
            out[f"blob_{c}"] = col_blobs[c]
        return out[col_names]

    return df.groupBy(part_col).applyInPandas(enc, schema)


def decode_series(
    enc: DataFrame,
    key_cols: list[str] = ("url",),
    ts_col: str = "bucket",
    value_cols: list[str] = ("crawl_count", "byte_size_sum", "byte_size_max"),
    value_types: dict | None = None,
) -> DataFrame:
    """Explode encoded chunks back to rows — narrow (no shuffle).

    mapInArrow, not mapInPandas (r10): the decoded output is millions of
    rows whose key columns are string repeats — building them as pandas
    object arrays paid one Python object per row plus a pandas→Arrow
    conversion of the whole decoded table. Arrow-side ``take`` repeats the
    key columns in C++ and the numeric columns wrap decode buffers
    zero-copy, so the Python boundary carries only the blob bytes in and
    Arrow buffers out."""
    import pyarrow as pa

    key_cols = list(key_cols)
    value_cols = list(value_cols)
    key_fields = [enc.schema[k] for k in key_cols]
    _named = {"long": LongType(), "double": DoubleType(),
              "boolean": BooleanType()}
    vt = {
        c: (_named[t] if isinstance(t, str) else t)
        for c, t in (value_types or {}).items()
    }
    fields = key_fields + [StructField(ts_col, TimestampType())]
    fields += [StructField(c, vt.get(c, LongType())) for c in value_cols]
    schema = StructType(fields)
    tz = enc.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"
    _arrow_named = {"long": pa.int64(), "double": pa.float64(),
                    "boolean": pa.bool_()}
    val_arrow = {
        c: _arrow_named[vt.get(c, LongType()).typeName()] for c in value_cols
    }
    names = key_cols + [ts_col] + value_cols

    def dec(batches):
        for b in batches:
            n_rows = b.num_rows
            if not n_rows:
                continue
            col = {n: b.column(i) for i, n in enumerate(b.schema.names)}
            metas = [_json_loads(m) for m in col["meta"].to_pylist()]
            ns = col["n"].to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            ts_arrays = sz.decode_batch(col["ts_blob"].to_pylist())
            ts_concat = (
                np.concatenate([a.view(np.int64) for a in ts_arrays])
                if ts_arrays
                else np.zeros(0, np.int64)
            )
            idx = pa.array(np.repeat(np.arange(n_rows, dtype=np.int64), ns))
            arrays = [col[k].take(idx) for k in key_cols]
            arrays.append(
                pa.array(ts_concat).cast(pa.timestamp("us", tz=tz))
            )
            for c in value_cols:
                vals = decode_value_columns_batch(
                    col[f"blob_{c}"].to_pylist(), [m[c] for m in metas]
                )
                cat = (
                    np.concatenate([np.asarray(v) for v in vals])
                    if vals
                    else np.zeros(0)
                )
                # safe cast (not astype): a non-integral float reaching a
                # long column must error as the pandas path did
                arrays.append(pa.array(cat).cast(val_arrow[c]))
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return enc.mapInArrow(dec, schema)


def query_encoded(
    enc: DataFrame,
    value_col: str,
    key_cols: list[str] = ("url",),
) -> DataFrame:
    """Per-key sum/max/min/count of a value column computed from blobs —
    the reference's REDUCE_SUM/REDUCE_MAX without materialization."""
    key_cols = list(key_cols)
    key_fields = [enc.schema[k] for k in key_cols]
    schema = StructType(
        key_fields
        + [
            StructField("p_sum", LongType()),
            StructField("p_max", LongType()),
            StructField("p_min", LongType()),
            StructField("p_cnt", LongType()),
        ]
    )
    blob_col = f"blob_{value_col}"

    def partials(it):
        cols = [f.name for f in schema.fields]
        for pdf in it:
            if not len(pdf):
                continue
            metas = [_json_loads(m)[value_col] for m in pdf["meta"]]
            blobs = list(pdf[blob_col])
            n_b = len(blobs)
            sums = np.zeros(n_b, np.int64)
            maxs = np.zeros(n_b, np.int64)
            mins = np.zeros(n_b, np.int64)
            ns = np.zeros(n_b, np.int64)
            # plain int64 sprintz blobs (no value transform in meta) take
            # the codec-level RLE-run fast path: zero-width blocks
            # aggregate from headers with no payload unpack
            plain = [
                i
                for i, m in enumerate(metas)
                if m.get("codec") == "sprintz"
                and m.get("np_dtype") == "int64"
                and "qparams" not in m
                and "offset" not in m
            ]
            if plain:
                c, s, mx, mn = sz.query_batch_partials([blobs[i] for i in plain])
                idx = np.array(plain, np.int64)
                ns[idx], sums[idx], maxs[idx], mins[idx] = c, s, mx, mn
            rest = [i for i in range(n_b) if i not in set(plain)]
            if rest:
                vals = decode_value_columns_batch(
                    [blobs[i] for i in rest], [metas[i] for i in rest]
                )
                for i, v in zip(rest, vals):
                    a = np.asarray(v, dtype=np.int64)
                    ns[i] = len(a)
                    sums[i], maxs[i], mins[i] = a.sum(), a.max(), a.min()
            out = pd.DataFrame({k: pdf[k].to_numpy() for k in key_cols})
            out["p_sum"] = sums
            out["p_max"] = maxs
            out["p_min"] = mins
            out["p_cnt"] = ns
            yield out[cols]

    part = enc.mapInPandas(partials, schema)
    return part.groupBy(*key_cols).agg(
        F.sum("p_sum").alias(f"{value_col}_sum"),
        F.max("p_max").alias(f"{value_col}_max"),
        F.min("p_min").alias(f"{value_col}_min"),
        F.sum("p_cnt").alias("n_points"),
    )


# --- multi-series containers (tiny-series tiers) ---------------------------

_CONT_COLS = None  # built per call


def encode_series_container(
    df: DataFrame,
    key_cols: list[str] = ("url",),
    ts_col: str = "bucket",
    value_cols: list[str] = ("crawl_count", "byte_size_sum", "byte_size_max"),
    chunk_rows: int = DEFAULT_CHUNK,
    part_col: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """One output row per (partition, container): ALL series of the slice
    packed into one blob per column (codecs.sprintz.encode_container).
    For tiers whose per-key series are tiny (the daily tier's 1-3 points)
    this amortizes per-blob framing to ~2-9 B per series — per-series rows
    would pay 10-21 B of head each. Series never straddle containers;
    containers are capped at ~chunk_rows rows, so decode memory is
    bounded regardless of partition size. int64 measures only."""
    if len(list(key_cols)) != 1:
        raise ValueError("container encoding supports a single key column")
    key = list(key_cols)[0]
    value_cols = list(value_cols)
    spark = df.sparkSession
    drop_part = part_col is None
    if part_col is None:
        part_col = "_enc_part"
        n_parts = n_parts or spark.sparkContext.defaultParallelism * 2
        df = df.withColumn(
            part_col, F.pmod(F.xxhash64(key), F.lit(n_parts)).cast("int")
        )
    if n_parts:
        # pin the encode task count against AQE byte-coalescing — see
        # encode_series (the container packer is equally CPU-bound)
        df = df.repartition(n_parts, part_col)
    key_t = df.schema[key].dataType
    part_t = df.schema[part_col].dataType
    fields = ([] if drop_part else [StructField(part_col, part_t)]) + [
        StructField("chunk", LongType()),
        StructField("n_series", LongType()),
        StructField("keys", ArrayType(key_t)),
        StructField("start_bucket", TimestampType()),
        StructField("end_bucket", TimestampType()),
        StructField("n", LongType()),
        StructField("ts_blob", BinaryType()),
        StructField("meta", StringType()),
        StructField("raw_bytes", LongType()),
        StructField("comp_bytes", LongType()),
        StructField("encode_secs", DoubleType()),
    ] + [StructField(f"blob_{c}", BinaryType()) for c in value_cols]
    schema = StructType(fields)
    col_names = [f.name for f in schema.fields]

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(columns=col_names)
        pdf = pdf.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        karr = pdf[key].to_numpy()
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = karr[1:] != karr[:-1]
        s_starts = np.flatnonzero(change)
        s_lens = np.diff(np.append(s_starts, n))
        # assign whole series to containers of <= chunk_rows rows
        cum = np.cumsum(s_lens)
        cont_of_series = ((cum - s_lens) // chunk_rows).astype(np.int64)
        ts_np = pdf[ts_col].astype("datetime64[us]").to_numpy()
        ts_i64 = ts_np.view(np.int64)
        rows = []
        for c_id in np.unique(cont_of_series):
            sel = cont_of_series == c_id
            lens_c = s_lens[sel]
            lo = int(s_starts[sel][0])
            hi = int(s_starts[sel][-1] + lens_c[-1])
            total = hi - lo
            ts_blob = sz.encode_container(ts_i64[lo:hi], lens_c, "doubledelta")
            raw = total * 8
            comp = len(ts_blob)
            rec = {
                "chunk": int(c_id),
                "n_series": int(sel.sum()),
                "keys": karr[s_starts[sel]].tolist(),
                "start_bucket": ts_np[lo],
                "end_bucket": ts_np[lo:hi].max(),
                "n": total,
                "ts_blob": ts_blob,
            }
            metas = {"ts": {"codec": "sprintz-container", "mode": "doubledelta"}}
            for c in value_cols:
                vals = pdf[c].to_numpy()[lo:hi]
                if vals.dtype != np.int64:
                    vals = vals.astype(np.int64)
                blob = sz.encode_container(vals, lens_c, "auto")
                metas[c] = {"codec": "sprintz-container", "np_dtype": "int64"}
                rec[f"blob_{c}"] = blob
                raw += total * 8
                comp += len(blob)
            rec["meta"] = json.dumps(metas)
            rec["raw_bytes"] = raw
            rec["comp_bytes"] = comp
            rows.append(rec)
        out = pd.DataFrame(rows)
        if not drop_part:
            out[part_col] = pdf[part_col].iloc[0]
        out["encode_secs"] = (time.perf_counter() - t0) / max(len(rows), 1)
        return out[col_names]

    return df.groupBy(part_col).applyInPandas(enc, schema)


def decode_series_container(
    enc: DataFrame,
    key_cols: list[str] = ("url",),
    ts_col: str = "bucket",
    value_cols: list[str] = ("crawl_count", "byte_size_sum", "byte_size_max"),
) -> DataFrame:
    """Explode container rows back to the original series rows (narrow).

    Any scalar column outside the container wire schema (e.g. the
    encoder's part_col, whatever it was named) passes through per row."""
    key = list(key_cols)[0]
    value_cols = list(value_cols)
    wire = {
        "chunk", "n_series", "keys", "start_bucket", "end_bucket", "n",
        "ts_blob", "meta", "raw_bytes", "comp_bytes", "encode_secs",
    } | {f"blob_{c}" for c in value_cols}
    extra = [c for c in enc.columns if c not in wire]
    fields = [StructField(p, enc.schema[p].dataType) for p in extra]
    fields += [
        StructField(key, enc.schema["keys"].dataType.elementType),
        StructField(ts_col, TimestampType()),
    ]
    fields += [StructField(c, LongType()) for c in value_cols]
    schema = StructType(fields)

    def dec(it):
        col_order = [f.name for f in schema.fields]
        for pdf in it:
            extras_np = {p: pdf[p].to_numpy() for p in extra}
            blob_cols = [pdf[f"blob_{c}"].to_numpy() for c in value_cols]
            for i, (keys, ts_blob) in enumerate(
                zip(pdf["keys"].to_numpy(), pdf["ts_blob"].to_numpy())
            ):
                ts_vals, ns = sz.decode_container(ts_blob)
                base = pd.DataFrame(
                    {key: np.repeat(np.asarray(keys, dtype=object), ns)}
                )
                for p in extra:
                    base.insert(0, p, extras_np[p][i])
                base[ts_col] = ts_vals.view(np.int64).astype("datetime64[us]")
                for c, blobs in zip(value_cols, blob_cols):
                    vals, _ = sz.decode_container(blobs[i])
                    base[c] = vals.view(np.int64)
                yield base[col_order]

    return enc.mapInPandas(dec, schema)


def query_encoded_container(
    enc: DataFrame,
    value_col: str,
    key_col: str = "url",
) -> DataFrame:
    """query_encoded over the container format: per-series sum/max/min/count
    partials come from one decode_container + reduceat per blob (the whole
    container's series in two numpy passes); Catalyst's partial+final
    aggregate combines across containers/partitions. No materialization."""
    key_t = enc.schema["keys"].dataType.elementType
    schema = StructType(
        [
            StructField(key_col, key_t),
            StructField("p_sum", LongType()),
            StructField("p_max", LongType()),
            StructField("p_min", LongType()),
            StructField("p_cnt", LongType()),
        ]
    )
    blob_col = f"blob_{value_col}"

    def partials(it):
        cols = [f.name for f in schema.fields]
        for pdf in it:
            frames = []
            for keys, blob in zip(pdf["keys"], pdf[blob_col]):
                # RLE-run fast path: per-series partials from block headers
                # (constant/affine runs never unpack payload)
                ns, sums, maxs, mins = sz.query_container_partials(blob)
                frames.append(
                    pd.DataFrame(
                        {
                            key_col: np.asarray(keys, dtype=object),
                            "p_sum": sums,
                            "p_max": maxs,
                            "p_min": mins,
                            "p_cnt": ns,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)[cols]

    part = enc.mapInPandas(partials, schema)
    return part.groupBy(key_col).agg(
        F.sum("p_sum").alias(f"{value_col}_sum"),
        F.max("p_max").alias(f"{value_col}_max"),
        F.min("p_min").alias(f"{value_col}_min"),
        F.sum("p_cnt").alias("n_points"),
    )
