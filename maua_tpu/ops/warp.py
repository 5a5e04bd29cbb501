"""Spatial warping: grid_sample, affine transforms (translate / rotate
/ zoom) — jittable, NHWC.

TPU-native replacement for the kornia warps used by the reference's
synthesis hooks (`maua/GAN/wrappers/stylegan2.py:153-194`) and the
grid_sample flow warping (`maua/flow/lib.py:51-63`).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _reflect_index(idx: jax.Array, size: int) -> jax.Array:
    """Reflect out-of-range indices (border pixels not repeated —
    matches 'reflection' in grid_sample with align_corners=False
    closely enough for feature warping)."""
    if size == 1:
        return jnp.zeros_like(idx)
    period = 2 * (size - 1)
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= size, period - idx, idx)


def grid_sample(
    x: jax.Array, grid: jax.Array, mode: str = "bilinear", padding_mode: str = "reflection"
) -> jax.Array:
    """Sample x (B, H, W, C) at grid (B, Hg, Wg, 2) of normalized
    coords in [-1, 1] (torch grid_sample convention: grid[..., 0] = x
    coordinate, align_corners=False)."""
    b, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0

    def gather(yi, xi):
        if padding_mode == "reflection":
            yi2 = _reflect_index(yi.astype(jnp.int32), h)
            xi2 = _reflect_index(xi.astype(jnp.int32), w)
            valid = jnp.ones_like(yi, jnp.float32)
        elif padding_mode == "border":
            yi2 = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
            xi2 = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
            valid = jnp.ones_like(yi, jnp.float32)
        else:  # zeros
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).astype(jnp.float32)
            yi2 = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
            xi2 = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        bidx = jnp.arange(b)[:, None, None]
        vals = x[bidx, yi2, xi2]  # (B, Hg, Wg, C)
        return vals * valid[..., None]

    if mode == "nearest":
        return gather(jnp.round(gy), jnp.round(gx))

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    tx = tx[..., None]
    ty = ty[..., None]
    return (
        v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty) + v10 * (1 - tx) * ty + v11 * tx * ty
    )


def identity_grid(b: int, h: int, w: int) -> jax.Array:
    """Neutral sampling grid (B, H, W, 2), normalized coords."""
    ys = (jnp.arange(h) + 0.5) * 2.0 / h - 1.0
    xs = (jnp.arange(w) + 0.5) * 2.0 / w - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy], axis=-1)
    return jnp.tile(grid[None], (b, 1, 1, 1))


def affine_grid(theta: jax.Array, b: int, h: int, w: int) -> jax.Array:
    """Sampling grid for 2x3 affine matrices mapping output coords to
    input coords (torch affine_grid convention)."""
    base = identity_grid(b, h, w)  # (B,H,W,2)
    ones = jnp.ones(base.shape[:-1] + (1,))
    coords = jnp.concatenate([base, ones], axis=-1)  # (B,H,W,3)
    return jnp.einsum("bhwk,bjk->bhwj", coords, theta)


def translate(x: jax.Array, translation: jax.Array, padding_mode: str = "reflection") -> jax.Array:
    """Shift by (tx, ty) in PIXELS per sample (kornia.translate
    semantics as used at `wrappers/stylegan2.py:158-163`).
    translation: (B, 2)."""
    b, h, w, _ = x.shape
    t = jnp.broadcast_to(jnp.asarray(translation, jnp.float32), (b, 2))
    theta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])[None], (b, 1, 1))
    # output pixel reads from input pixel shifted by -t (normalized)
    shift = jnp.stack([-2.0 * t[:, 0] / w, -2.0 * t[:, 1] / h], axis=1)
    theta = theta.at[:, :, 2].set(shift)
    return grid_sample(x, affine_grid(theta, b, h, w), padding_mode=padding_mode)


def rotate(x: jax.Array, angle_deg: jax.Array, center: Optional[Tuple[float, float]] = None,
           padding_mode: str = "reflection") -> jax.Array:
    """Rotate counter-clockwise by degrees about center (default image
    center), kornia.rotate semantics. angle_deg: scalar or (B,)."""
    b, h, w, _ = x.shape
    ang = jnp.broadcast_to(jnp.asarray(angle_deg, jnp.float32), (b,)) * (math.pi / 180.0)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    # rotation in normalized, aspect-corrected space
    theta = jnp.stack(
        [
            jnp.stack([cos, sin * h / w, jnp.zeros_like(cos)], axis=1),
            jnp.stack([-sin * w / h, cos, jnp.zeros_like(cos)], axis=1),
        ],
        axis=1,
    )
    if center is not None:
        cx = 2.0 * center[0] / w - 1.0
        cy = 2.0 * center[1] / h - 1.0
        c = jnp.asarray([cx, cy], jnp.float32)
        offs = c[None, :] - jnp.einsum("bij,j->bi", theta[:, :, :2], c)
        theta = theta.at[:, :, 2].set(offs)
    return grid_sample(x, affine_grid(theta, b, h, w), padding_mode=padding_mode)


def zoom(x: jax.Array, factor: jax.Array, center: Optional[Tuple[float, float]] = None,
         padding_mode: str = "reflection") -> jax.Array:
    """Scale about center (kornia.scale semantics: factor > 1 zooms
    in). factor: scalar or (B,)."""
    b, h, w, _ = x.shape
    f = jnp.broadcast_to(jnp.asarray(factor, jnp.float32), (b,))
    inv = 1.0 / jnp.maximum(f, 1e-6)
    zero = jnp.zeros_like(inv)
    theta = jnp.stack(
        [jnp.stack([inv, zero, zero], axis=1), jnp.stack([zero, inv, zero], axis=1)], axis=1
    )
    if center is not None:
        cx = 2.0 * center[0] / w - 1.0
        cy = 2.0 * center[1] / h - 1.0
        c = jnp.asarray([cx, cy], jnp.float32)
        offs = c[None, :] - inv[:, None] * c[None, :]
        theta = theta.at[:, :, 2].set(offs)
    return grid_sample(x, affine_grid(theta, b, h, w), padding_mode=padding_mode)


def resize_bicubic(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bicubic resize NHWC (torch interpolate align_corners=False
    equivalent via jax.image)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bicubic")
