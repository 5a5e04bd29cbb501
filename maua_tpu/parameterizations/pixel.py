"""Palette-constrained pixel-art parameterization
(`maua/parameterizations/pixel.py:49-333`, compact rebuild): a learned
palette plus per-pixel soft palette weights with optional hard
(straight-through) quantization."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..loss import replace_grad
from . import Parameterization


class Pixel(Parameterization):
    def __init__(self, height, width, tensor=None, n_colors: int = 8, hard: bool = False, ema: bool = False, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        logits = jax.random.normal(k1, (1, height, width, n_colors)) * 0.1
        palette = jax.random.uniform(k2, (n_colors, 3))
        params = {"logits": logits, "palette": palette}
        super().__init__(height, width, params, ema=ema)
        self.n_colors = n_colors
        self.hard = hard
        if tensor is not None:
            self.encode(tensor)

    def params(self):
        return self.tensor

    def decode(self, tensor=None) -> jax.Array:
        p = self.tensor if tensor is None else tensor
        weights = jax.nn.softmax(p["logits"], axis=-1)
        if self.hard:
            hard_w = jax.nn.one_hot(jnp.argmax(weights, -1), self.n_colors)
            weights = replace_grad(hard_w, weights)
        img = jnp.einsum("bhwn,nc->bhwc", weights, jnp.clip(p["palette"], 0, 1))
        return img * 2.0 - 1.0

    def encode(self, img):
        """k-means-lite palette fit of an existing image."""
        x = (jnp.asarray(img) + 1.0) / 2.0
        flat = x.reshape(-1, 3)
        idx = jnp.linspace(0, flat.shape[0] - 1, self.n_colors).astype(jnp.int32)
        palette = flat[idx]
        d = jnp.sum((flat[:, None, :] - palette[None]) ** 2, -1)
        logits = -d.reshape(1, self.h, self.w, self.n_colors) * 10.0
        self.tensor = {"logits": logits, "palette": palette}

    def palette_loss(self) -> jax.Array:
        """Encourage distinct palette entries (reference palette
        losses, pixel.py:214+)."""
        pal = self.tensor["palette"]
        d = jnp.sum((pal[:, None] - pal[None]) ** 2, -1)
        off = d + jnp.eye(self.n_colors) * 1e3
        return jnp.mean(jnp.exp(-off * 20))
