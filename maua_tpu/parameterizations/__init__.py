"""Optimizable image parameterizations with EMA averaging.

Rebuild of `maua/parameterizations/__init__.py:5-59` (Parameterization
base with debiased EMA + load_parameterization) in functional JAX:
each parameterization is a (params pytree, decode fn) pair wrapped in
a small object carrying EMA state. Decoded images are NHWC [-1, 1]
(this package's canonical range; the torch reference decodes to
[0, 1]).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class Parameterization:
    """(`parameterizations/__init__.py:5-46`)"""

    def __init__(self, height: int, width: int, tensor: jax.Array, ema: bool = False, decay: float = 0.99):
        self.h, self.w = height, width
        self.tensor = tensor
        self.ema = ema
        self.decay = decay
        if ema:
            self.biased = jax.tree_util.tree_map(jnp.zeros_like, tensor)
            self.average = jax.tree_util.tree_map(jnp.zeros_like, tensor)
            self.accum = jnp.ones(())
            self.update_ema()

    # params exposed to the optimizer
    def params(self):
        return self.tensor

    def set_params(self, tensor):
        self.tensor = tensor

    def encode(self, img):
        raise NotImplementedError

    def decode(self, tensor=None) -> jax.Array:
        raise NotImplementedError

    def update_ema(self):
        if self.ema:
            self.accum = self.accum * self.decay
            self.biased = jax.tree_util.tree_map(
                lambda b, t: b * self.decay + (1 - self.decay) * t, self.biased, self.tensor)
            self.average = jax.tree_util.tree_map(lambda b: b / (1 - self.accum), self.biased)

    def reset_ema(self):
        if self.ema:
            self.biased = jax.tree_util.tree_map(jnp.zeros_like, self.biased)
            self.average = jax.tree_util.tree_map(jnp.zeros_like, self.average)
            self.accum = jnp.ones(())
            self.update_ema()

    def decode_average(self) -> jax.Array:
        if self.ema:
            return self.decode(self.average)
        return self.decode()

    def __call__(self):
        return self.decode()


def load_parameterization(which: str):
    """(`parameterizations/__init__.py:51-59`)"""
    which = which.lower()
    if which == "rgb":
        from .rgb import RGB

        return RGB
    if which == "fourier":
        from .fourier import Fourier

        return Fourier
    if which == "pixel":
        from .pixel import Pixel

        return Pixel
    if which == "vqgan":
        from .vqgan import VQGAN

        return VQGAN
    if which == "stylegan":
        from .stylegan import StyleGANLatent

        return StyleGANLatent
    raise Exception(f"Parameterization {which} not recognized!")
