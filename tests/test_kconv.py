"""K-packed Pallas conv (kernels/kconv.py) vs lax conv — exact parity
in interpret mode, including the fused modulated-conv epilogue."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.kernels.kconv import kconv3x3


def _ref(x, w, bias=None, style=None, demod=None, alpha=None, gain=1.0):
    if style is not None:
        x = x * style[:, None, None, :]
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if demod is not None:
        y = y * demod[:, None, None, :]
    if bias is not None:
        y = y + bias
    if alpha is not None:
        y = jnp.where(y >= 0, y, y * alpha) * gain
    return y


@pytest.mark.parametrize(
    "h,w,ci,co",
    [
        (16, 20, 5, 3),     # unpadded channels, h not a band multiple
        (13, 130, 32, 32),  # aligned Ci, multi-tile W
        (24, 33, 51, 51),   # SG3 layer-11-like channel counts
        (9, 260, 81, 51),   # SG3 layer-10-like
    ],
)
def test_kconv_matches_lax(h, w, ci, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    ref = np.asarray(_ref(x, wt))
    got = np.asarray(kconv3x3(x, wt, interpret=True))
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() < 1e-4


def test_kconv_fused_epilogue():
    rng = np.random.RandomState(1)
    b, h, w, ci, co = 3, 12, 40, 17, 9
    x = jnp.asarray(rng.randn(b, h, w, ci).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    style = jnp.asarray(rng.rand(b, ci).astype(np.float32) + 0.5)
    demod = jnp.asarray(rng.rand(b, co).astype(np.float32) + 0.5)
    ref = np.asarray(_ref(x, wt, bias, style, demod, alpha=0.2, gain=float(np.sqrt(2.0))))
    got = np.asarray(kconv3x3(x, wt, bias=bias, style=style, demod=demod,
                              alpha=0.2, gain=float(np.sqrt(2.0)), interpret=True))
    assert np.abs(ref - got).max() < 1e-4


def test_kconv_band_r_independent():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 21, 30, 8).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    a = np.asarray(kconv3x3(x, wt, band_r=4, interpret=True))
    b = np.asarray(kconv3x3(x, wt, band_r=8, interpret=True))
    assert np.abs(a - b).max() < 1e-5
