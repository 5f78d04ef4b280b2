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
            cols = list(pdf.columns)
            rows = []
            for tup in pdf.itertuples(index=False):
                rec = dict(zip(cols, tup))
                payload = rec[payload_col]
                if not fake:
                    raise NotImplementedError("video decode not available")
                n_frames = (len(payload or b"") % 97) + 1
                for fi in range(0, n_frames, every_n):
                    sig = hashlib.sha256((payload or b"") + fi.to_bytes(4, "little")).digest()
                    rows.append({**rec, "frame_idx": fi,
                                 "frame_sig": int.from_bytes(sig[:8], "little", signed=True)})
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=list(pdf.columns) + ["frame_idx", "frame_sig"]
            )

    return df.mapInPandas(gen, schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    out_h: int = 4,
    out_w: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Resize plumbing: decode -> nearest-neighbor resize -> re-emit as a
    binary column of raw out_h*out_w*3 pixels plus shape metadata. The
    RESIZE math is real numpy (index-gather nearest neighbor); only the
    pixel source is the deterministic fake decoder."""
    base = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    schema = base + ", pixels binary, height int, width int, channels int"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pix = []
            for payload in pdf[payload_col]:
                img = _fake_decode(payload) if fake else decode_image(payload)
                h, w, c = img.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                pix.append(img[ys][:, xs].tobytes())
            pdf = pdf.copy()
            pdf["pixels"] = pix
            pdf["height"] = np.int32(out_h)
            pdf["width"] = np.int32(out_w)
            pdf["channels"] = np.int32(3)
            yield pdf

    return df.mapInPandas(gen, schema)


def audio_features(
    df: DataFrame, payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Audio plumbing: decode -> rms / zero-crossing-rate / duration.
    Feature math is real numpy over the deterministic fake PCM (a real
    deployment swaps in soundfile/ffmpeg for the decode only)."""
    base = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    schema = base + ", n_samples long, rms double, zcr double"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ns, rms, zcr = [], [], []
            for payload in pdf[payload_col]:
                if not fake:
                    raise NotImplementedError("audio decode not available")
                b = payload or b"\x00\x00"
                d = hashlib.sha256(b).digest()
                n = (len(b) % 1024) + 256  # deterministic fake sample count
                reps = (2 * n + len(d) - 1) // len(d)
                pcm = np.frombuffer((d * reps)[: 2 * n], dtype=np.int16).astype(np.float64)
                pcm /= 32768.0
                ns.append(len(pcm))
                rms.append(float(np.sqrt((pcm * pcm).mean())))
                zcr.append(float((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).mean()))
            pdf = pdf.copy()
            pdf["n_samples"] = np.array(ns, np.int64)
            pdf["rms"] = rms
            pdf["zcr"] = zcr
            yield pdf

    return df.mapInPandas(gen, schema)
