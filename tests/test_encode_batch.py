"""encode_batch must produce blobs that decode_column reads identically to
the per-series encoder, across boundary-heavy series mixes."""

import numpy as np
import pytest

from sprintz_spark.codecs import sprintz as sz

rng = np.random.default_rng(7)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int64])
@pytest.mark.parametrize("mode", [None, "delta", "doubledelta"])
def test_batch_matches_per_series(dtype, mode):
    arrays = []
    for n in [0, 1, 2, 7, 8, 9, 40, 64, 100, 1000]:
        walk = np.cumsum(rng.integers(-3, 4, n)).astype(dtype)
        arrays.append(walk)
        arrays.append(np.full(n, 7, dtype=dtype))  # constant (RLE path)
        arrays.append((np.arange(n) * 3).astype(dtype))  # ramp (dd wins)
    blobs = sz.encode_batch(arrays, mode)
    assert len(blobs) == len(arrays)
    for a, b in zip(arrays, blobs):
        back = sz.decode_column(b).view(a.dtype)
        np.testing.assert_array_equal(back, a)
        if mode is not None:
            # forced-mode batch output is byte-identical to encode_column
            assert b == sz.encode_column(a, mode)


def test_batch_auto_picks_doubledelta_for_ramps():
    ramp = (np.arange(640) * 997).astype(np.int64)
    const = np.full(640, 3, np.int64)
    blobs = sz.encode_batch([ramp, const], None)
    assert sz.blob_mode(blobs[0]) == "doubledelta"
    for a, b in zip([ramp, const], blobs):
        np.testing.assert_array_equal(sz.decode_column(b).view(np.int64), a)


def test_batch_speed_on_tiny_series():
    import time

    arrays = [np.cumsum(rng.integers(-3, 4, 40)).astype(np.int64) for _ in range(2000)]
    t0 = time.perf_counter()
    blobs = sz.encode_batch(arrays, None)
    batch_t = time.perf_counter() - t0
    assert batch_t < 1.0, f"2000 tiny series took {batch_t:.2f}s in batch mode"
    for a, b in zip(arrays[:50], blobs[:50]):
        np.testing.assert_array_equal(sz.decode_column(b).view(np.int64), a)


def test_decode_batch_matches_decode_column():
    import time

    mixed = []
    for n in [0, 1, 7, 8, 40, 333, 4096]:
        walk = np.cumsum(rng.integers(-5, 6, n)).astype(np.int64)
        mixed.append(sz.encode_column(walk, "delta"))
        mixed.append(sz.encode_column(walk, "doubledelta"))
        mixed.append(sz.encode_column((walk & 0xFFFF).astype(np.uint16), "fire"))
        mixed.append(sz.encode_column((walk & 0xFF).astype(np.uint8), "raw"))
        mixed.append(sz.encode_column((walk & 0xFFFF).astype(np.uint16), "dyndelta"))
    outs = sz.decode_batch(mixed)
    for buf, got in zip(mixed, outs):
        np.testing.assert_array_equal(got, sz.decode_column(buf))


def test_decode_batch_speed():
    import time

    arrays = [np.cumsum(rng.integers(-3, 4, 40)).astype(np.int64) for _ in range(2000)]
    blobs = sz.encode_batch(arrays, None)
    t0 = time.perf_counter()
    outs = sz.decode_batch(blobs)
    t = time.perf_counter() - t0
    assert t < 0.5, f"decode_batch of 2000 tiny blobs took {t:.2f}s"
    for a, o in zip(arrays, outs):
        np.testing.assert_array_equal(o.view(np.int64), a)
