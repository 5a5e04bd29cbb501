"""Cutout samplers for CLIP guidance.

Rebuild of `maua/ops/cutouts.py` (random_cutouts :9, MauaCutouts :41,
Cutouts :51, DangoCutouts :102, make_cutouts :209): crop+resize
augmentation batches feeding the CLIP image tower. Implemented with a
single gather-based `crop_and_resize` (static output shapes, batched
over cutouts) instead of per-crop Python loops.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp



def _crop_resize(img: jax.Array, y0, x0, size, out_size: int) -> jax.Array:
    """Differentiable crop (y0, x0, size scalars, traced) + bilinear
    resize to out_size. img: (H, W, C)."""
    h, w, _ = img.shape
    ys = y0 + (jnp.arange(out_size) + 0.5) * size / out_size - 0.5
    xs = x0 + (jnp.arange(out_size) + 0.5) * size / out_size - 0.5
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    y0i = jnp.floor(ys).astype(jnp.int32)
    x0i = jnp.floor(xs).astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    wy = (ys - y0i)[:, None, None]
    wx = (xs - x0i)[None, :, None]
    v00 = img[y0i][:, x0i]
    v01 = img[y0i][:, x1i]
    v10 = img[y1i][:, x0i]
    v11 = img[y1i][:, x1i]
    return v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx + v10 * wy * (1 - wx) + v11 * wy * wx


def random_cutouts(key, img: jax.Array, cut_size: int, n_cuts: int, cut_pow: float = 1.0) -> jax.Array:
    """(`maua/ops/cutouts.py:9`): random square crops resized to
    cut_size. img: (B, H, W, C) -> (B * n_cuts, cut_size, cut_size, C)."""
    b, h, w, c = img.shape
    min_size = min(h, w, cut_size)
    max_size = min(h, w)
    k1, k2, k3 = jax.random.split(key, 3)
    sizes = (jax.random.uniform(k1, (n_cuts,)) ** cut_pow * (max_size - min_size) + min_size)
    y0s = jax.random.uniform(k2, (n_cuts,)) * (h - sizes)
    x0s = jax.random.uniform(k3, (n_cuts,)) * (w - sizes)

    def one_image(im):
        return jax.vmap(lambda y0, x0, s: _crop_resize(im, y0, x0, s, cut_size))(y0s, x0s, sizes)

    cuts = jax.vmap(one_image)(img)  # (B, n_cuts, S, S, C)
    return cuts.reshape(b * n_cuts, cut_size, cut_size, c)


class Cutouts:
    """Fixed-count random cutouts (`maua/ops/cutouts.py:51`)."""

    def __init__(self, cut_size: int, n_cuts: int = 16, cut_pow: float = 1.0):
        self.cut_size = cut_size
        self.n_cuts = n_cuts
        self.cut_pow = cut_pow

    def __call__(self, img, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return random_cutouts(key, img, self.cut_size, self.n_cuts, self.cut_pow)


class MauaCutouts(Cutouts):
    """Pyramid-biased cutouts (`maua/ops/cutouts.py:41`): half the cuts
    zoomed to details, half to full frame."""

    def __call__(self, img, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        detail = random_cutouts(k1, img, self.cut_size, self.n_cuts // 2, cut_pow=3.0)
        wide = random_cutouts(k2, img, self.cut_size, self.n_cuts - self.n_cuts // 2, cut_pow=0.3)
        return jnp.concatenate([detail, wide])


class DangoCutouts(Cutouts):
    """Overview + inner-crop mix (`maua/ops/cutouts.py:102`)."""

    def __init__(self, cut_size: int, n_cuts: int = 16, cut_pow: float = 1.0, overview: int = 4):
        super().__init__(cut_size, n_cuts, cut_pow)
        self.overview = min(overview, n_cuts)

    def __call__(self, img, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        b, h, w, c = img.shape
        full = jax.image.resize(img, (b, self.cut_size, self.cut_size, c), "bilinear")
        full = jnp.tile(full, (self.overview, 1, 1, 1))
        inner = random_cutouts(key, img, self.cut_size, self.n_cuts - self.overview, self.cut_pow)
        return jnp.concatenate([full, inner])


def make_cutouts(kind: str, cut_size: int, n_cuts: int = 16, cut_pow: float = 1.0):
    """(`maua/ops/cutouts.py:209`)"""
    return {"maua": MauaCutouts, "normal": Cutouts, "dango": DangoCutouts}[kind](cut_size, n_cuts, cut_pow)
