"""Fourier-space image parameterization with frequency-scaled
spectrum (`maua/parameterizations/fourier.py`; lucid/clip-style
decorrelated parameterization)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import Parameterization
from ..audio.spectral import RISpec, irfft_real, rfft_real, use_real_dft

# lucid color decorrelation matrix
_COLOR_CORR = np.asarray([[0.26, 0.09, 0.02], [0.27, 0.00, -0.05], [0.27, -0.09, 0.03]], np.float32)
_COLOR_CORR_NORM = _COLOR_CORR / np.linalg.norm(_COLOR_CORR, axis=0).max()


def _freqs(h, w):
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    return np.sqrt(fx * fx + fy * fy)


@functools.lru_cache(maxsize=None)
def _fft_mats(n: int):
    """Full-DFT cos/sin matrices (n, n) for the H-axis complex FFT on
    backends without complex support (see audio/spectral.py real-DFT
    seam)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * m / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _irfft2_real(re: jax.Array, im: jax.Array, h: int, w: int) -> jax.Array:
    """irfft2 over the last two axes of an (..., h, w//2+1) re/im pair."""
    C, S = _fft_mats(h)
    C, S = jnp.asarray(C), jnp.asarray(S)
    # complex ifft along -2: x[m] = (1/h) sum_k X[k] e^{+2 pi i k m / h}
    re1 = (jnp.einsum("...kw,km->...mw", re, C) - jnp.einsum("...kw,km->...mw", im, S)) / h
    im1 = (jnp.einsum("...kw,km->...mw", re, S) + jnp.einsum("...kw,km->...mw", im, C)) / h
    return irfft_real(RISpec(re1, im1), w, axis=-1)


def _rfft2_real(x: jax.Array):
    """rfft2 over the last two axes of a real array; returns RISpec."""
    f = rfft_real(x, axis=-1)  # (..., h, w//2+1)
    h = x.shape[-2]
    C, S = _fft_mats(h)
    C, S = jnp.asarray(C), jnp.asarray(S)
    # complex fft along -2: X[k] = sum_m x[m] e^{-2 pi i k m / h}
    re = jnp.einsum("...mw,km->...kw", f.re, C) + jnp.einsum("...mw,km->...kw", f.im, S)
    im = jnp.einsum("...mw,km->...kw", f.im, C) - jnp.einsum("...mw,km->...kw", f.re, S)
    return RISpec(re, im)


class Fourier(Parameterization):
    def __init__(self, height, width, tensor=None, std: float = 0.01, ema: bool = False, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        spectrum_shape = (1, 3, height, width // 2 + 1, 2)
        if tensor is None:
            tensor = jax.random.normal(key, spectrum_shape) * std
        super().__init__(height, width, tensor, ema)
        scale = 1.0 / np.maximum(_freqs(height, width), 1.0 / max(height, width))
        self.scale = jnp.asarray(scale * np.sqrt(height * width), jnp.float32)

    def decode(self, tensor=None) -> jax.Array:
        t = self.tensor if tensor is None else tensor
        if use_real_dft():
            img = _irfft2_real(t[..., 0] * self.scale, t[..., 1] * self.scale, self.h, self.w)
        else:
            spectrum = (t[..., 0] + 1j * t[..., 1]) * self.scale
            img = jnp.fft.irfft2(spectrum, s=(self.h, self.w))  # (1, 3, H, W)
        img = img.transpose(0, 2, 3, 1) / 4.0
        img = jnp.einsum("...c,cd->...d", img, jnp.asarray(_COLOR_CORR_NORM.T))
        return jnp.tanh(img)

    def encode(self, img):
        x = jnp.asarray(img)
        x = jnp.arctanh(jnp.clip(x, -0.999, 0.999))
        x = jnp.einsum("...c,cd->...d", x, jnp.linalg.inv(jnp.asarray(_COLOR_CORR_NORM.T)))
        x = x.transpose(0, 3, 1, 2) * 4.0
        if use_real_dft():
            spec = _rfft2_real(x)
            self.tensor = jnp.stack([spec.re / self.scale, spec.im / self.scale], axis=-1)
        else:
            spec = jnp.fft.rfft2(x) / self.scale
            self.tensor = jnp.stack([spec.real, spec.imag], axis=-1)
