import numpy as np
import pytest

from sprintz_spark.codecs import search as S

rng = np.random.default_rng(21)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int64])
def test_search_roundtrip_int(dtype):
    for x in [
        np.cumsum(rng.integers(-3, 4, 1000)).astype(dtype),
        np.zeros(777, dtype=dtype),
        rng.integers(0, 100, 13).astype(dtype),
        np.arange(0, 3000, 3).astype(dtype),
    ]:
        buf = S.search_encode(x)
        np.testing.assert_array_equal(
            S.search_decode(buf).view(dtype), x
        )


def test_search_roundtrip_float():
    x = np.round(np.cumsum(rng.normal(0, 1, 2000)), 3)
    buf = S.search_encode(x)
    np.testing.assert_array_equal(
        S.search_decode(buf).view(np.uint64), x.view(np.uint64)
    )


def test_search_picks_sensibly():
    const = np.full(10_000, 42, np.int64)
    assert len(S.search_encode(const)) < 200
    rep = S.search_report(np.cumsum(rng.integers(-2, 3, 5000)).astype(np.int64))
    assert rep["sprintz-delta"] < rep["raw"]
    assert set(rep) >= {"sprintz-delta", "sprintz-doubledelta", "bzip2",
                        "byteshuffle-lzma", "raw", "raw_bytes"}
