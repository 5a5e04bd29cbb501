"""Direct pixel parameterization (`maua/parameterizations/rgb.py:14-30`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..loss import clamp_with_grad
from . import Parameterization


class RGB(Parameterization):
    def __init__(self, height, width, tensor=None, colorspace: str = "rgb", ema: bool = False, key=None):
        if tensor is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            tensor = jax.random.uniform(key, (1, height, width, 3)) * 0.1
        else:
            tensor = (jnp.asarray(tensor) + 1.0) / 2.0  # store in [0, 1] like the reference
        super().__init__(height, width, tensor, ema)
        self.colorspace = colorspace

    def decode(self, tensor=None) -> jax.Array:
        t = self.tensor if tensor is None else tensor
        return clamp_with_grad(t, 0.0, 1.0) * 2.0 - 1.0

    def encode(self, img):
        self.tensor = jnp.clip((jnp.asarray(img) + 1.0) / 2.0, 0, 1)
