"""The r10 vectorized compact-head ('Z'/'Y') batch parser must be
bit-equivalent to the scalar _parse route for every mode / width /
format / shape combination, including the fallbacks (deflated blobs, v1
heads, over-large headers, per-blob-state modes)."""

import numpy as np
import pytest

from sprintz_spark.codecs import sprintz as sz

_DT = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def _mk(rng, w, n, kind):
    dt = _DT[w]
    if kind == 0:
        return rng.integers(0, 1 << min(w, 63), n, dtype=np.uint64).astype(dt)
    if kind == 1:  # regular ramp (timestamp-like; all-zero dd residuals)
        return (np.arange(n, dtype=np.uint64) * 60_000_000 + 17).astype(dt)
    if kind == 2:  # constant
        return np.full(n, 42, dtype=dt)
    return rng.integers(0, 50, n, dtype=np.uint64).astype(dt)


@pytest.mark.parametrize("w", [8, 16, 32, 64])
def test_batch_matches_scalar_per_width(w):
    rng = np.random.default_rng(w)
    modes = ["delta", "doubledelta", "raw"] + (
        ["fire", "ewma"] if w in (8, 16) else []
    )
    blobs, expect = [], []
    for n in (0, 1, 2, 3, 7, 8, 9, 40, 1000, 70000):
        for kind in range(4):
            x = _mk(rng, w, n, kind)
            for mode in modes:
                for deflate in (False, True):
                    blobs.append(sz.encode_column(x, mode, deflate=deflate))
                    expect.append(x)
    res = sz.decode_batch(blobs)
    for blob, x, r in zip(blobs, expect, res):
        scalar = sz.decode_column(blob)
        assert len(r) == len(x)
        assert (np.asarray(r) == np.asarray(scalar)).all()
        assert (np.asarray(r) == x).all()


def test_big_mixed_batch_roundtrip():
    rng = np.random.default_rng(99)
    blobs, expect = [], []
    for _ in range(4000):
        w = int(rng.choice([8, 16, 64]))
        n = int(rng.choice([1, 2, 5, 40, 100]))
        x = _mk(rng, w, n, int(rng.integers(0, 4)))
        mode = str(
            rng.choice(
                ["delta", "doubledelta", "raw"]
                + (["fire"] if w in (8, 16) else [])
            )
        )
        blobs.append(sz.encode_column(x, mode, deflate=False))
        expect.append(x)
    for x, r in zip(expect, sz.decode_batch(blobs)):
        assert (x == r).all()


def test_over_large_header_falls_back():
    # alternating widths make one RLE run per block -> nruns >> cap
    rng = np.random.default_rng(5)
    x = np.where(
        np.arange(4096) % 16 < 8,
        rng.integers(0, 3, 4096, dtype=np.uint64),
        rng.integers(1 << 30, 1 << 40, 4096, dtype=np.uint64),
    ).astype(np.uint64)
    blob = sz.encode_column(x, "delta", deflate=False)
    assert (sz.decode_batch([blob])[0] == x).all()
