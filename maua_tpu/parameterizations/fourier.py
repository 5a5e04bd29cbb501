"""Fourier-space image parameterization with frequency-scaled
spectrum (`maua/parameterizations/fourier.py`; lucid/clip-style
decorrelated parameterization)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import Parameterization

# lucid color decorrelation matrix
_COLOR_CORR = np.asarray([[0.26, 0.09, 0.02], [0.27, 0.00, -0.05], [0.27, -0.09, 0.03]], np.float32)
_COLOR_CORR_NORM = _COLOR_CORR / np.linalg.norm(_COLOR_CORR, axis=0).max()


def _freqs(h, w):
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    return np.sqrt(fx * fx + fy * fy)


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
        spec = jnp.fft.rfft2(x) / self.scale
        self.tensor = jnp.stack([spec.real, spec.imag], axis=-1)
