"""Tests for the native C++ kernels + fallbacks
(reference: efficient_quantile.cpp, inverse_op_cython.pyx)."""

import numpy as np
import pytest

from maua_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of native kernels failed"


def test_efficient_quantile_matches_numpy():
    rs = np.random.RandomState(0)
    x = rs.randn(100_000).astype(np.float32)
    qs = [0.01, 0.25, 0.5, 0.75, 0.95, 0.99]
    out = native.efficient_quantile(x, qs)
    ref = np.quantile(x, qs)
    assert np.allclose(out, ref, atol=1e-5), (out, ref)


def test_efficient_quantile_ignore_nan():
    rs = np.random.RandomState(1)
    x = rs.randn(10_000).astype(np.float32)
    x[::10] = np.nan
    out = native.efficient_quantile(x, [0.5], ignore_nan=True)
    ref = np.nanquantile(x, [0.5])
    assert np.allclose(out, ref, atol=1e-5)


def test_kthvalue():
    rs = np.random.RandomState(2)
    x = rs.randn(997).astype(np.float32)
    for k in [1, 10, 500, 997]:
        assert native.kthvalue(x, k) == pytest.approx(np.sort(x)[k - 1], abs=1e-6)


def _masked_weight(rs, c, k, is_upper):
    """Autoregressive masked conv weight whose taps only reference
    positions already solved by the kernel's processing order:
    is_upper=False processes (j,i) descending with channels ascending,
    so valid taps are at j_>j / i_>i and center cross-channel ci<co;
    is_upper=True is the mirror."""
    w = np.zeros((k, k, c, c), np.float32)
    kc = (k - 1) // 2
    for kk in range(k):
        for mm in range(k):
            if is_upper:
                solved = (kk < kc) or (kk == kc and mm < kc)
            else:
                solved = (kk > kc) or (kk == kc and mm > kc)
            if solved:
                w[kk, mm] = rs.randn(c, c) * 0.2
    center = rs.randn(c, c) * 0.2
    # ci > co solved for is_upper (channels descending); ci < co otherwise
    mask = np.tril(np.ones((c, c)), -1) if is_upper else np.triu(np.ones((c, c)), 1)
    w[kc, kc] = center * mask + np.eye(c) * (1.0 + rs.rand(c))
    return w


def _forward_conv(x, w):
    """y = conv(x, w) with same padding, NHWC/HWIO, correlation."""
    from scipy.signal import correlate

    b, h, wd, c = x.shape
    k = w.shape[0]
    pad = (k - 1) // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    y = np.zeros_like(x)
    for co in range(c):
        for ci in range(c):
            for bb in range(b):
                y[bb, :, :, co] += correlate(xp[bb, :, :, ci], w[:, :, ci, co], mode="valid")
    return y


@pytest.mark.parametrize("is_upper", [False, True])
def test_inverse_conv_roundtrip(is_upper):
    rs = np.random.RandomState(3)
    c, k = 3, 3
    x_true = rs.randn(1, 6, 6, c).astype(np.float32)
    w = _masked_weight(rs, c, k, is_upper)
    z = _forward_conv(x_true, w)
    x_rec = native.inverse_conv(z, w, is_upper=is_upper)
    assert np.abs(x_rec - x_true).max() < 1e-3, np.abs(x_rec - x_true).max()


def test_inverse_conv_py_fallback_matches_native():
    rs = np.random.RandomState(4)
    c, k = 2, 3
    w = _masked_weight(rs, c, k, False)
    z = rs.randn(1, 4, 4, c).astype(np.float32)
    nat = native.inverse_conv(z, w, is_upper=False)
    py = native._inverse_conv_py(z, w, False, 1)
    assert np.allclose(nat, py, atol=1e-4)


def test_quantile_device():
    rs = np.random.RandomState(5)
    x = rs.randn(1000).astype(np.float32)
    out = np.asarray(native.quantile_device(x, [0.25, 0.75]))
    ref = np.quantile(x, [0.25, 0.75])
    assert np.allclose(out, ref, atol=1e-4)
