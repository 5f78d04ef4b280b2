"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as BinaryType columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. Real media decode dispatches at RUNTIME: when the
codec library (PIL for images, soundfile for audio) is importable it is
used; in this container those libs are absent, so the default paths run
a deterministic fake decoder instead — the Spark-side plumbing (schema,
batching, partitioning, vectorized feature math) is fully real and
tested either way, mirroring the zstd runtime-dispatch pattern in
codecs/extras.py.

All feature/resize/sample math is batched numpy over the whole Arrow
batch; the only per-item Python is the hash call inside the fake decoder
itself (sha256 has no batch API), exactly like a real decoder would be
per-item inside the C library.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # runtime dispatch: real decoder when the library exists
    from PIL import Image as _PIL_Image  # pragma: no cover (absent in sandbox)
except ImportError:
    _PIL_Image = None

try:
    import soundfile as _soundfile  # pragma: no cover (absent in sandbox)
except ImportError:
    _soundfile = None


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode via PIL when importable; raises otherwise.

    Returns an (h, w, 3) uint8 RGB array."""
    if _PIL_Image is None:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg (not in this container); "
            "use the fake=True paths or install pillow"
        )
    img = _PIL_Image.open(io.BytesIO(payload)).convert("RGB")  # pragma: no cover
    return np.asarray(img, dtype=np.uint8)  # pragma: no cover


def decode_audio(payload: bytes) -> np.ndarray:
    """Real audio decode: RIFF/PCM WAV via the stdlib ``wave`` module
    (zero dependencies, so this branch is testable in any container);
    other formats dispatch to soundfile when importable.

    Returns mono float64 PCM in [-1, 1]."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        with wave.open(io.BytesIO(payload), "rb") as wf:
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
        if width == 2:
            pcm = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
        elif width == 1:  # 8-bit WAV is unsigned
            pcm = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif width == 4:
            pcm = np.frombuffer(raw, np.int32).astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"unsupported WAV sample width {width}")
        return pcm.reshape(-1, n_ch).mean(axis=1) if n_ch > 1 else pcm
    if _soundfile is None:
        raise NotImplementedError(
            "non-WAV audio decode requires soundfile/libsndfile (not in "
            "this container); use PCM WAV, the fake=True paths, or "
            "install soundfile"
        )
    data, _sr = _soundfile.read(io.BytesIO(payload))  # pragma: no cover
    pcm = np.asarray(data, dtype=np.float64)  # pragma: no cover
    return pcm.mean(axis=1) if pcm.ndim > 1 else pcm  # pragma: no cover


def _fake_decode(payload: bytes, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes -> h*w*3 uint8."""
    d = hashlib.sha256(payload or b"").digest()
    reps = (h * w * 3 + len(d) - 1) // len(d)
    return np.frombuffer((d * reps)[: h * w * 3], dtype=np.uint8).reshape(h, w, 3)


def _decode_batch(payloads, fake: bool = True, h: int = 8, w: int = 8) -> np.ndarray:
    """(n, h, w, 3) uint8 stack for the whole Arrow batch (fake decoder:
    shapes are uniform by construction, so the stack is always valid;
    real decoders go through the per-shape grouping in image_features)."""
    assert fake, "real decode paths group by shape; see image_features"
    return np.stack([_fake_decode(p, h, w) for p in payloads])


def _features_one_shape(imgs: np.ndarray) -> tuple:
    """Vectorized features for a stacked (n, h, w, 3) float64 batch.

    phash bits beyond the pixel count are zero-padded so images smaller
    than 64 pixels still produce a well-formed 64-bit signature."""
    n = len(imgs)
    means = imgs.mean(axis=(1, 2))  # (n, 3)
    gray = imgs.mean(axis=3).reshape(n, -1)  # (n, h*w)
    med = np.median(gray, axis=1, keepdims=True)
    bits = (gray > med)[:, :64].astype(np.uint8)
    bits64 = np.zeros((n, 64), np.uint8)
    bits64[:, : bits.shape[1]] = bits
    phash = (
        np.packbits(bits64, axis=1, bitorder="little").copy().view(np.int64).ravel()
    )
    return means, imgs.reshape(n, -1).std(axis=1), phash


def image_features(
    df: DataFrame, payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: mean/std per channel + phash-like
    64-bit signature. Feature math is one vectorized pass over the
    stacked batch when all images share a shape (always true for the
    fake decoder); real decoders with heterogeneous sizes group by shape
    and run the same vectorized kernel per group — only the decode
    itself is per-item."""
    schema = (
        ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
        + ", mean_r double, mean_g double, mean_b double, std_all double, phash long"
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                yield pdf.assign(
                    mean_r=[], mean_g=[], mean_b=[], std_all=[], phash=[]
                )
                continue
            n = len(pdf)
            if fake:
                imgs = _decode_batch(pdf[payload_col], True).astype(np.float64)
                means, stds, phash = _features_one_shape(imgs)
            else:
                decoded = [decode_image(p) for p in pdf[payload_col]]
                means = np.empty((n, 3))
                stds = np.empty(n)
                phash = np.empty(n, np.int64)
                by_shape: dict = {}
                for i, im in enumerate(decoded):
                    by_shape.setdefault(im.shape, []).append(i)
                for idxs in by_shape.values():
                    stack = np.stack([decoded[i] for i in idxs]).astype(np.float64)
                    m, s, p = _features_one_shape(stack)
                    means[idxs] = m
                    stds[idxs] = s
                    phash[idxs] = p
            pdf = pdf.copy()
            pdf["mean_r"] = means[:, 0]
            pdf["mean_g"] = means[:, 1]
            pdf["mean_b"] = means[:, 2]
            pdf["std_all"] = stds
            pdf["phash"] = phash
            yield pdf

    return df.mapInPandas(gen, schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    every_n: int = 10,
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    Fake path synthesizes a deterministic frame count from payload size.
    Row expansion is vectorized: per-row sample counts -> np.repeat row
    gather + concatenated per-row aranges (no itertuples, no per-row
    dict building); only the per-frame signature hash is a Python call,
    as a real frame decoder would be."""
    base = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    schema = base + ", frame_idx int, frame_sig long"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("video decode not available")
            payloads = pdf[payload_col].to_numpy()
            lens = np.fromiter(
                (len(p or b"") for p in payloads), np.int64, len(payloads)
            )
            n_frames = (lens % 97) + 1
            n_samp = (n_frames + every_n - 1) // every_n  # frames 0, e, 2e, ...
            if not n_samp.sum():
                yield pd.DataFrame(
                    columns=list(pdf.columns) + ["frame_idx", "frame_sig"]
                )
                continue
            rep = np.repeat(np.arange(len(pdf), dtype=np.int64), n_samp)
            intra = np.arange(int(n_samp.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(n_samp)[:-1]]), n_samp
            )
            frame_idx = intra * every_n
            out = pdf.iloc[rep].reset_index(drop=True)
            sigs = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.sha256(
                            (p or b"") + int(fi).to_bytes(4, "little")
                        ).digest()[:8],
                        "little",
                        signed=True,
                    )
                    for p, fi in zip(payloads[rep], frame_idx)
                ),
                np.int64,
                len(rep),
            )
            out["frame_idx"] = frame_idx.astype(np.int32)
            out["frame_sig"] = sigs
            yield out

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
    resize is one batched index-gather over the stacked batch (real
    decoders with per-image shapes fall back to per-image gathers)."""
    base = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    schema = base + ", pixels binary, height int, width int, channels int"

    def _resize_one(img: np.ndarray) -> bytes:
        h, w, _c = img.shape
        ys = (np.arange(out_h) * h) // out_h
        xs = (np.arange(out_w) * w) // out_w
        return img[ys][:, xs].tobytes()

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            if fake and len(pdf):
                imgs = _decode_batch(pdf[payload_col], fake=True)  # (n,8,8,3)
                h, w = imgs.shape[1], imgs.shape[2]
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = imgs[:, ys][:, :, xs]  # (n, out_h, out_w, 3)
                flat = resized.reshape(len(pdf), -1)
                pdf["pixels"] = [row.tobytes() for row in flat]
            else:
                pdf["pixels"] = [
                    _resize_one(decode_image(p)) for p in pdf[payload_col]
                ]  # pragma: no cover
            pdf["height"] = np.int32(out_h)
            pdf["width"] = np.int32(out_w)
            pdf["channels"] = np.int32(3)
            yield pdf

    return df.mapInPandas(gen, schema)


def audio_features(
    df: DataFrame, payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Audio plumbing: decode -> rms / zero-crossing-rate / sample count.

    Fake PCM buffers are variable-length, so the batch is packed into one
    concatenated array and reduced with np.add.reduceat — same shape as
    the codec batch encoders; no per-item feature loops."""
    base = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    schema = base + ", n_samples long, rms double, zcr double"

    def _fake_pcm(payload: bytes) -> np.ndarray:
        b = payload or b"\x00\x00"
        d = hashlib.sha256(b).digest()
        n = (len(b) % 1024) + 256  # deterministic fake sample count
        reps = (2 * n + len(d) - 1) // len(d)
        return np.frombuffer((d * reps)[: 2 * n], dtype=np.int16)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            if not len(pdf):
                pdf["n_samples"] = np.zeros(0, np.int64)
                pdf["rms"] = np.zeros(0)
                pdf["zcr"] = np.zeros(0)
                yield pdf
                continue
            if fake:
                pcms = [_fake_pcm(p) for p in pdf[payload_col]]
                cat = np.concatenate(pcms).astype(np.float64) / 32768.0
            else:  # pragma: no cover
                pcms = [decode_audio(p) for p in pdf[payload_col]]
                cat = np.concatenate(pcms)
            ns = np.fromiter((len(p) for p in pcms), np.int64, len(pcms))
            starts = np.concatenate([[0], np.cumsum(ns)[:-1]])
            sq_sums = np.add.reduceat(cat * cat, starts)
            signs = np.signbit(cat)
            # flips[j] = sign change between cat[j] and cat[j+1]; pad so
            # reduceat indices stay in range for length-1 tail segments
            flips = np.concatenate(
                [(signs[1:] != signs[:-1]).astype(np.int64), [0]]
            )
            flip_sums = np.add.reduceat(flips, starts)
            # each segment's reduceat span [s_i, s_{i+1}) also counts the
            # boundary flip between its last sample and the next segment's
            # first sample (at index s_{i+1}-1); subtract it back out
            ends = starts + ns - 1
            flip_sums = flip_sums - flips[ends]
            pdf["n_samples"] = ns
            pdf["rms"] = np.sqrt(sq_sums / ns)
            pdf["zcr"] = flip_sums / np.maximum(ns - 1, 1)
            yield pdf

    return df.mapInPandas(gen, schema)
