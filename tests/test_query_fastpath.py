"""RLE-run fast-path correctness: query partials computed from block
headers (no payload unpack for zero-width blocks) must equal full
decode+aggregate, bit-for-bit, across wire formats and modes."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sprintz_spark.codecs import sprintz as sz


def _agg(vals: np.ndarray):
    v = vals.astype(np.int64)
    return len(v), int(v.sum()), int(v.max()), int(v.min())


def _check_blob(arr: np.ndarray, mode: str):
    buf = sz.encode_column(arr, mode)
    want = _agg(sz.decode_column(buf))
    got = sz.query_blob_partials(buf)
    assert got == want, f"mode={mode} n={len(arr)}"


CASES = [
    # constant-heavy (pure zero blocks after the first)
    np.full(1000, 42, np.int64),
    # ramp: dd gives all-zero blocks, delta gives constant-width runs
    np.arange(0, 5000, 7, dtype=np.int64),
    # piecewise constant with run breaks not on block boundaries
    np.repeat(np.array([5, 5, 9, 9, 9, 2], np.int64), [100, 3, 50, 1, 7, 200]),
    # negatives and sign flips
    np.array([-5, -5, -5, 3, -1000, 7], np.int64),
    # single point / sub-block lengths (pad handling)
    np.array([123456789], np.int64),
    np.array([10, 20], np.int64),
    np.arange(13, dtype=np.int64) * -3 + 7,
    # large values (epoch-µs scale)
    np.int64(1_700_000_000_000_000) + np.arange(100, dtype=np.int64) * 60_000_000,
]


@pytest.mark.parametrize("mode", ["delta", "doubledelta"])
@pytest.mark.parametrize("i", range(len(CASES)))
def test_blob_fastpath_matches_decode(mode, i):
    _check_blob(CASES[i], mode)


@pytest.mark.parametrize("mode", ["delta", "doubledelta"])
def test_blob_fastpath_large_n_instream(mode):
    # n > 65536 forces the SZ1 in-stream-firsts head (x0 in the stream)
    rng = np.random.default_rng(7)
    arr = np.cumsum(rng.integers(-3, 4, 70000)).astype(np.int64)
    _check_blob(arr, mode)


@given(
    st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=300),
    st.sampled_from(["delta", "doubledelta"]),
)
@settings(max_examples=60, deadline=None)
def test_blob_fastpath_property(vals, mode):
    _check_blob(np.array(vals, np.int64), mode)


def test_batch_partials_mixed_modes():
    blobs, want = [], []
    rng = np.random.default_rng(3)
    for i in range(20):
        n = int(rng.integers(1, 200))
        arr = np.cumsum(rng.integers(-2, 3, n)).astype(np.int64) + i
        mode = ["delta", "doubledelta", "raw"][i % 3]
        blobs.append(sz.encode_column(arr, mode))
        want.append(_agg(arr))
    cnts, sums, maxs, mins = sz.query_batch_partials(blobs)
    for i, (n, s, mx, mn) in enumerate(want):
        assert (cnts[i], sums[i], maxs[i], mins[i]) == (n, s, mx, mn)


@pytest.mark.parametrize("mode", ["delta", "doubledelta", "auto"])
def test_container_partials(mode):
    rng = np.random.default_rng(11)
    lens = rng.integers(1, 40, 50).astype(np.int64)
    vals = np.concatenate(
        [np.full(n, int(rng.integers(-100, 100)), np.int64) + np.arange(n) * int(rng.integers(-2, 3)) for n in lens]
    )
    buf = sz.encode_container(vals, lens, mode)
    dec_vals, dec_ns = sz.decode_container(buf)
    ns, sums, maxs, mins = sz.query_container_partials(buf)
    assert (ns == dec_ns).all()
    starts = np.concatenate([[0], np.cumsum(dec_ns)[:-1]])
    v = dec_vals.astype(np.int64)
    assert (sums == np.add.reduceat(v, starts)).all()
    assert (maxs == np.maximum.reduceat(v, starts)).all()
    assert (mins == np.minimum.reduceat(v, starts)).all()


def test_fastpath_skips_payload_on_constant_runs():
    """A constant series after the first block is ALL zero-width blocks;
    the fast path must not unpack them (payload is empty past block 0)."""
    arr = np.full(100_000, 7, np.int64)
    buf = sz.encode_column(arr, "delta", deflate=False)
    mode, w, n, pad, extra, nbits, payload, firsts = sz._parse(buf)
    # in-stream head (n > 65536): block 0 carries x0, everything after is runs
    assert (nbits[1:] == 0).all()
    assert len(payload) <= int(nbits[0])  # block 0 only (+ zero-truncated)
    assert sz.query_blob_partials(buf) == (100_000, 700_000, 7, 7)


def test_query_compressed_ops():
    arr = np.repeat(np.array([3, -4, 10], np.int64), [50, 60, 70])
    buf = sz.encode_column(arr, "delta")
    assert sz.query_compressed(buf, "count") == 180
    assert sz.query_compressed(buf, "sum") == int(arr.sum())
    assert sz.query_compressed(buf, "max") == 10
    assert sz.query_compressed(buf, "min") == -4
