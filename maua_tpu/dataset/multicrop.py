"""Multi-crop dataset for self-supervised training (SwAV-style).

Rebuild of `maua/dataset/multicrop.py:33-80`: per image, several
global + local random-resized crops with flip/color jitter, produced
on device from a cached image array.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def random_resized_crop(key, img: jax.Array, out_size: int, scale: Tuple[float, float] = (0.14, 1.0)) -> jax.Array:
    """Differentiable random crop + resize of one (H, W, C) image."""
    k1, k2, k3 = jax.random.split(key, 3)
    h, w, c = img.shape
    area = jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    size = jnp.sqrt(area) * jnp.minimum(h, w)
    y0 = jax.random.uniform(k2, ()) * (h - size)
    x0 = jax.random.uniform(k3, ()) * (w - size)
    ys = jnp.clip(y0 + (jnp.arange(out_size) + 0.5) * size / out_size - 0.5, 0, h - 1)
    xs = jnp.clip(x0 + (jnp.arange(out_size) + 0.5) * size / out_size - 0.5, 0, w - 1)
    yi = jnp.floor(ys).astype(jnp.int32)
    xi = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(yi + 1, h - 1)
    x1 = jnp.minimum(xi + 1, w - 1)
    wy = (ys - yi)[:, None, None]
    wx = (xs - xi)[None, :, None]
    v = (
        img[yi][:, xi] * (1 - wy) * (1 - wx)
        + img[yi][:, x1] * (1 - wy) * wx
        + img[y1][:, xi] * wy * (1 - wx)
        + img[y1][:, x1] * wy * wx
    )
    return v


class MultiCropDataset:
    """(`maua/dataset/multicrop.py:33-80`): yields lists of crop
    batches [(B, s0, s0, C) x n0, (B, s1, s1, C) x n1, ...]."""

    def __init__(
        self,
        images: np.ndarray,  # (N, H, W, C) float [0, 1]
        size_crops: Sequence[int] = (224, 96),
        n_crops: Sequence[int] = (2, 6),
        scale_crops: Sequence[Tuple[float, float]] = ((0.14, 1.0), (0.05, 0.14)),
        batch_size: int = 8,
        seed: int = 0,
    ):
        self.images = np.asarray(images)
        self.size_crops = list(size_crops)
        self.n_crops = list(n_crops)
        self.scale_crops = list(scale_crops)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

    def __len__(self):
        return len(self.images) // self.batch_size

    def __iter__(self) -> Iterator[List[jax.Array]]:
        order = self.rng.permutation(len(self.images))
        for b in range(len(self)):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            batch = jnp.asarray(self.images[np.sort(idx)])
            crops = []
            for size, n, scale in zip(self.size_crops, self.n_crops, self.scale_crops):
                for ci in range(n):
                    self.key, sub = jax.random.split(self.key)
                    keys = jax.random.split(sub, batch.shape[0])
                    crop = jax.vmap(lambda im, k: random_resized_crop(k, im, size, scale))(batch, keys)
                    # random flip
                    self.key, kf = jax.random.split(self.key)
                    flip = jax.random.bernoulli(kf, 0.5, (batch.shape[0],))
                    crop = jnp.where(flip[:, None, None, None], crop[:, :, ::-1, :], crop)
                    crops.append(crop)
            yield crops
