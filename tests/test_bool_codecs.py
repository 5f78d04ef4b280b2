"""BoolDelta + BooleanToCategorical — the two codecs the reference
declares but leaves unimplemented (/root/reference/python/codec.py:
238-239 and 595-601); the TODO comments there pin the intended
semantics, implemented for real here (XOR-delta; uint8 category codes
with NA=2, no bitpacking so downstream delta/RLE run unchanged)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sprintz_spark.codecs.extras import (
    bool_to_categorical_decode,
    bool_to_categorical_encode,
)
from sprintz_spark.codecs.sprintz import blob_mode, decode_column, encode_column


@pytest.mark.parametrize("n", [0, 1, 2, 7, 8, 9, 64, 65, 1000, 65535, 65536, 70001])
def test_booldelta_roundtrip_sizes(n):
    rng = np.random.default_rng(n)
    x = rng.random(n) < 0.5
    blob = encode_column(x, "booldelta")
    assert blob_mode(blob) == "booldelta" or n == 0
    out = decode_column(blob)
    np.testing.assert_array_equal(out.view(bool), x)


def test_booldelta_runs_compress():
    # long constant runs XOR to zero residuals -> near-1-bit blocks; the
    # whole point of the "can't just uint8" delta (direction would need
    # sign bits, XOR doesn't)
    x = np.repeat([True, False, True], 20000)
    blob = encode_column(x, "booldelta", deflate=False)
    raw = encode_column(x.view(np.uint8), "raw", deflate=False)
    assert len(blob) < len(raw) / 4
    np.testing.assert_array_equal(decode_column(blob).view(bool), x)


def test_booldelta_rejects_wide_ints():
    with pytest.raises(ValueError):
        encode_column(np.arange(10, dtype=np.int64), "booldelta")


@given(st.lists(st.booleans(), max_size=300))
@settings(max_examples=60, deadline=None)
def test_booldelta_roundtrip_property(bits):
    x = np.array(bits, dtype=bool)
    np.testing.assert_array_equal(
        decode_column(encode_column(x, "booldelta")).view(bool), x
    )


def test_bool_to_categorical_plain():
    x = np.array([True, False, True])
    codes, nullable = bool_to_categorical_encode(x)
    assert codes.dtype == np.uint8 and not nullable
    np.testing.assert_array_equal(codes, [1, 0, 1])
    out = bool_to_categorical_decode(codes, nullable)
    assert out.dtype == np.dtype(bool)
    np.testing.assert_array_equal(out, x)


def test_bool_to_categorical_nullable():
    import pandas as pd

    s = pd.array([True, None, False, True], dtype="boolean")
    codes, nullable = bool_to_categorical_encode(s)
    assert nullable
    np.testing.assert_array_equal(codes, [1, 2, 0, 1])
    out = bool_to_categorical_decode(codes, nullable)
    assert pd.isna(out[1]) and out[0] and not out[2]
    # codes are a normal uint8 column: booldelta composes on top (NA=2
    # forces 2-bit blocks, still round-trips through the int path)
    np.testing.assert_array_equal(
        decode_column(encode_column(codes, "delta")).view(np.uint8)[: len(codes)],
        codes,
    )


def test_bool_to_categorical_object_array():
    obj = np.array([True, None, False], dtype=object)
    codes, nullable = bool_to_categorical_encode(obj)
    assert nullable
    np.testing.assert_array_equal(codes, [1, 2, 0])


def test_booldelta_in_batch_decode():
    from sprintz_spark.codecs.sprintz import decode_batch

    rng = np.random.default_rng(7)
    xs = [rng.random(n) < 0.3 for n in (5, 0, 300, 8191)]
    blobs = [encode_column(x, "booldelta") for x in xs]
    blobs.append(encode_column(np.arange(100, dtype=np.int32), "delta"))
    outs = decode_batch(blobs)
    for x, o in zip(xs, outs[:-1]):
        np.testing.assert_array_equal(o.view(bool), x)
    np.testing.assert_array_equal(
        outs[-1].view(np.int32), np.arange(100, dtype=np.int32)
    )
