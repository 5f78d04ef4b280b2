"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as BinaryType columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. The actual media decode is STUBBED (codec libraries
are not in this container): ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder stands
in so the Spark-side plumbing (schema, batching, partitioning) is fully
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real impl would use PIL/libjpeg (not installed)."""
    raise NotImplementedError("image decode requires PIL/libjpeg; use fake=True paths")


def _fake_decode(payload: bytes, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes -> h*w*3 uint8."""
    d = hashlib.sha256(payload or b"").digest()
    reps = (h * w * 3 + len(d) - 1) // len(d)
    return np.frombuffer((d * reps)[: h * w * 3], dtype=np.uint8).reshape(h, w, 3)


def image_features(
    df: DataFrame, payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: mean/std per channel + phash-like
    64-bit signature. Schema and batch shape are production-real; only the
    pixel source is the deterministic fake."""
    schema = (
        ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
        + ", mean_r double, mean_g double, mean_b double, std_all double, phash long"
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = {"mean_r": [], "mean_g": [], "mean_b": [], "std_all": [], "phash": []}
            for payload in pdf[payload_col]:
                if not fake:
                    img = decode_image(payload)  # pragma: no cover
                else:
                    img = _fake_decode(payload)
                f64 = img.astype(np.float64)
                feats["mean_r"].append(float(f64[..., 0].mean()))
                feats["mean_g"].append(float(f64[..., 1].mean()))
                feats["mean_b"].append(float(f64[..., 2].mean()))
                feats["std_all"].append(float(f64.std()))
                gray = f64.mean(axis=2)
                bits = (gray > np.median(gray)).ravel()[:64]
                ph = 0
                for i, b in enumerate(bits):
                    ph |= int(b) << i
                feats["phash"].append(np.int64(np.uint64(ph)))
            for k, v in feats.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(gen, schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    every_n: int = 10,
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.
    Fake path synthesizes a deterministic frame count from payload size."""
    base = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    schema = base + ", frame_idx int, frame_sig long"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                if not fake:
                    raise NotImplementedError("video decode not available")
                n_frames = (len(payload or b"") % 97) + 1
                for fi in range(0, n_frames, every_n):
                    r = row.to_dict()
                    r["frame_idx"] = fi
                    sig = hashlib.sha256((payload or b"") + fi.to_bytes(4, "little")).digest()
                    r["frame_sig"] = int.from_bytes(sig[:8], "little", signed=True)
                    rows.append(r)
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=list(pdf.columns) + ["frame_idx", "frame_sig"]
            )

    return df.mapInPandas(gen, schema)
