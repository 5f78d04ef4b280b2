"""Codec-family scale rehearsal (round-6; matches the dedup/CC and
timeseries rehearsals recorded in BASELINE.md).

The encode path is the north-star metric, but its scale evidence was the
38.4M-row fused bench only. This script measures the three codec paths —
sprintz batch (auto delta/dd), the multi-series container, and the
CodecSearch probe+encode — at 10x point-count steps on four deterministic
tier-corpus-shaped families, recording throughput (M points/s) and
compression ratio at each step. Flat-or-rising throughput and stable
ratios across steps are the evidence the kernels (global numpy passes,
chunked at 2^16 like the fused job) have no super-linear component.

Usage: python scripts/scale_rehearsal_codec.py   (pure numpy, no Spark)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sprintz_spark.codecs import search as S  # noqa: E402
from sprintz_spark.codecs import sprintz as sz  # noqa: E402

CHUNK = 1 << 16  # the fused job's chunk_rows


def families(n: int) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(42)
    smooth = np.cumsum(rng.integers(-3, 4, n)).astype(np.int64)
    steps = np.repeat(
        rng.integers(0, 5000, max(n // 500, 1)).astype(np.int64), 500
    )[:n]
    resid = rng.integers(0, 300, n).astype(np.uint16)
    entropy = rng.integers(0, 1 << 62, n).astype(np.int64)
    return {
        "smooth_counter": smooth,
        "steppy": np.ascontiguousarray(steps),
        "resid_u16": resid,
        "entropy": entropy,
    }


def chunk_lens(n: int) -> np.ndarray:
    full, rem = divmod(n, CHUNK)
    lens = [CHUNK] * full + ([rem] if rem else [])
    return np.asarray(lens, dtype=np.int64)


def best2(fn) -> float:
    w = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        w = min(w, time.perf_counter() - t0)
    return w


def run_path(path: str, x: np.ndarray) -> dict:
    lens = chunk_lens(len(x))
    if path == "sprintz":
        blobs = sz.encode_batch_concat(x, lens, None, False)
        ew = best2(lambda: sz.encode_batch_concat(x, lens, None, False))
        dw = best2(lambda: sz.decode_batch(blobs))
        out = sz.decode_batch(blobs)
        assert all(
            np.array_equal(o.view(x.dtype), c)
            for o, c in zip(out, np.split(x, np.cumsum(lens)[:-1]))
        )
        size = sum(len(b) for b in blobs)
    elif path == "container":
        blob = sz.encode_container(x, lens, "auto", False)
        ew = best2(lambda: sz.encode_container(x, lens, "auto", False))
        dw = best2(lambda: sz.decode_container(blob))
        vals, ns = sz.decode_container(blob)
        assert np.array_equal(vals.view(x.dtype), x) and np.array_equal(ns, lens)
        size = len(blob)
    elif path == "search":
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        def enc():
            return [
                S.search_encode(x[s : s + l]) for s, l in zip(starts, lens)
            ]
        blobs = enc()
        ew = best2(enc)
        dw = best2(lambda: [S.search_decode(b) for b in blobs])
        out = np.concatenate([S.search_decode(b).view(x.dtype) for b in blobs])
        assert np.array_equal(out, x)
        size = sum(len(b) for b in blobs)
    else:
        raise ValueError(path)
    return {
        "enc_mpts": round(len(x) / ew / 1e6, 2),
        "dec_mpts": round(len(x) / dw / 1e6, 2),
        "ratio": round(x.nbytes / size, 2),
    }


def main() -> None:
    sizes = [100_000, 1_000_000, 10_000_000]
    results: dict = {}
    for n in sizes:
        fams = families(n)
        for fam, x in fams.items():
            for path in ("sprintz", "container", "search"):
                if path == "search" and n > 1_000_000:
                    continue  # probe cost is per-chunk-constant; 10^6 shows the trend
                r = run_path(path, x)
                results[f"{fam}/{path}/{n}"] = r
                print(
                    f"{fam:15s} {path:9s} n={n:>9,d}  "
                    f"enc {r['enc_mpts']:7.2f} Mpts/s  dec {r['dec_mpts']:7.2f} Mpts/s  "
                    f"ratio {r['ratio']:6.2f}x"
                )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       ".data", "codec_rehearsal.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
