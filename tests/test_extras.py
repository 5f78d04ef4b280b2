import numpy as np
import pytest

from sprintz_spark.codecs import extras as X

rng = np.random.default_rng(11)


@pytest.mark.parametrize("dtype", [np.uint16, np.int32, np.int64, np.float64])
def test_byteshuffle_roundtrip(dtype):
    x = rng.integers(-1000, 1000, 333).astype(dtype)
    sh = X.byteshuffle_encode(x)
    back = X.byteshuffle_decode(sh, dtype, len(x))
    np.testing.assert_array_equal(back.view(np.uint8), x.view(np.uint8))


def test_byteshuffle_groups_bytes():
    # smooth 16-bit data: high bytes nearly constant -> shuffled second
    # half is low-entropy (that's the point of the transform)
    x = (5000 + np.arange(256)).astype(np.uint16)
    sh = X.byteshuffle_encode(x)
    assert len(set(sh[256:].tolist())) <= 2  # high bytes almost constant


def test_colsum_predictor_roundtrip():
    a = rng.integers(0, 1000, 100).astype(np.int64)
    b = rng.integers(0, 1000, 100).astype(np.int64)
    total = a + b + rng.integers(-3, 4, 100)
    resid = X.colsum_residual(total, [a, b])
    assert np.abs(resid).max() <= 3
    np.testing.assert_array_equal(X.colsum_restore(resid, [a, b]), total)


def test_colsum_weighted_roundtrip_exact():
    """Round trip is exact for ANY weights: decode recomputes identical
    predictions from the read-only predictor columns (reference
    ColSumPredictor semantics, codec.py:538-591)."""
    a = np.cumsum(rng.integers(-5, 6, 500)).astype(np.int64)
    b = rng.integers(-50, 50, 500).astype(np.int64)
    target = (3 * a + b + rng.integers(-2, 3, 500)).astype(np.int64)
    for w in (None, np.array([[3.0, 1.0]]), np.array([[0.31, -1.7]]),
              np.array([[1.0, 0.0], [2.0, 1.0], [-0.5, 0.3]])):  # 3-tap FIR
        resid = X.colsum_residual(target, [a, b], w)
        np.testing.assert_array_equal(X.colsum_restore(resid, [a, b], w), target)


def test_colsum_fir_recovers_taps():
    """lstsq trainer alignment matches np.correlate(mode='same') lags."""
    base = np.cumsum(rng.integers(-5, 6, 3000)).astype(np.int64)
    w_true = np.array([[2.0], [3.0], [-1.0]])
    pred = np.correlate(base.astype(np.float64), w_true[:, 0], mode="same")
    target = (pred + rng.integers(-2, 3, 3000)).astype(np.int64)
    w_fit = X.train_colsum_weights(target, [base], taps=3)
    np.testing.assert_allclose(w_fit, w_true, atol=0.05)
    r_fit = X.colsum_residual(target, [base], w_fit)
    r_none = X.colsum_residual(target, [base])
    assert np.abs(r_fit).mean() < 0.01 * np.abs(r_none.astype(np.float64)).mean()


def test_colsum_weighted_beats_unweighted_cost():
    a = np.cumsum(rng.integers(0, 10, 2000)).astype(np.int64)
    target = (a * 4 + rng.integers(-1, 2, 2000)).astype(np.int64)
    w = X.train_colsum_weights(target, [a], taps=1)
    cost_w = X.sprintz_packed_size(X.colsum_residual(target, [a], w))
    cost_u = X.sprintz_packed_size(X.colsum_residual(target, [a]))
    assert cost_w < cost_u


def test_zstd_dispatch_lzma_branch():
    """zstandard is absent in this sandbox: blobs must be 'L'-tagged and
    round-trip through the lzma fallback."""
    x = np.repeat(np.arange(100), 50).astype(np.int64)
    buf = X.zstd_encode(x)
    assert buf[:1] == (b"Z" if X._zstandard is not None else b"L")
    np.testing.assert_array_equal(X.zstd_decode(buf, np.int64), x)


def test_zstd_dispatch_zstd_branch_mocked(monkeypatch):
    """Unit-mock the zstandard module (zlib-backed) to exercise the 'Z'
    branch and the decode-side dispatch."""
    import zlib

    class _C:
        def __init__(self, level=3):
            pass

        def compress(self, b):
            return zlib.compress(b, 6)

    class _D:
        def decompress(self, b):
            return zlib.decompress(b)

    class _Mod:
        ZstdCompressor = _C
        ZstdDecompressor = _D

    monkeypatch.setattr(X, "_zstandard", _Mod)
    x = np.arange(1000, dtype=np.int64) * 7
    buf = X.zstd_encode(x)
    assert buf[:1] == b"Z"
    np.testing.assert_array_equal(X.zstd_decode(buf, np.int64), x)
    # 'L' blobs written by a zstd-less producer still decode
    monkeypatch.setattr(X, "_zstandard", None)
    buf_l = X.zstd_encode(x)
    assert buf_l[:1] == b"L"
    np.testing.assert_array_equal(X.zstd_decode(buf_l, np.int64), x)


def test_bytestream_codecs():
    x = np.repeat(np.arange(100), 50).astype(np.int64)
    for enc, dec in [(X.bzip2_encode, X.bzip2_decode), (X.lzma_encode, X.lzma_decode)]:
        buf = enc(x)
        assert len(buf) < x.nbytes / 4
        np.testing.assert_array_equal(dec(buf, np.int64), x)


def test_debug_and_lambda():
    x = np.arange(10)
    np.testing.assert_array_equal(
        X.debug_reverse_decode(X.debug_reverse_encode(x)), x
    )
    enc, dec = X.make_lambda_codec(lambda v: v + 1, lambda v: v - 1)
    np.testing.assert_array_equal(dec(enc(x)), x)


def test_losses_and_nbits_cost():
    r = np.array([0, 1, -1, 7, -8], dtype=np.int64)
    assert X.compute_loss(r, "l1") == 17
    assert X.compute_loss(r, "linf") == 8
    assert X.compute_loss(r, "l2") == 1 + 1 + 49 + 64
    np.testing.assert_array_equal(X.nbits_cost(r), [0, 2, 1, 4, 4])
    u = np.array([0, 1, 255, 256], dtype=np.uint64)
    np.testing.assert_array_equal(X.nbits_cost(u), [0, 1, 8, 9])


def test_sprintz_packed_size_model():
    zeros = np.zeros(64, dtype=np.int8)
    assert X.sprintz_packed_size(zeros) == 8 * 8  # 8 windows x 1 byte
    small = np.full(8, 3, dtype=np.int8)  # needs 3 bits (signed-ish model)
    assert X.sprintz_packed_size(small) > 8 * 2
