"""Perlin noise generators (3-D tileable and multiscale 2-D).

Rebuild of `maua/ops/noise.py` (perlin_noise :27-87, perlin :94-106,
create_perlin_noise :124-132) on jax.random — explicit keys replace
global numpy/torch RNG state.
"""

from __future__ import annotations

from functools import reduce

import jax
import jax.numpy as jnp
import numpy as np


def factors(n: int) -> np.ndarray:
    return np.array(list(set(reduce(list.__add__, ([i, n // i] for i in range(1, int(n**0.5) + 1) if n % i == 0)))))


def round_to_closest_divisor(num: int, div: int) -> int:
    options = np.sort(factors(num))
    best = options[np.argmin(np.abs(div - options))]
    return int(best)


def _perlinterpolant(t):
    return t * t * t * (t * (t * 6 - 15) + 10)


def perlin_noise(key, shape, res, tileable=(True, False, False)) -> jax.Array:
    """3-D perlin noise in [-1, 1] (`maua/ops/noise.py:27-87`).

    shape: (T, H, W); res: periods per axis (snapped to divisors of
    shape); tileable: wrap gradients along each axis.
    """
    res = tuple(round_to_closest_divisor(shape[r], res[r]) for r in range(3))
    d = tuple(shape[i] // res[i] for i in range(3))

    # fractional position of every voxel inside its lattice cell
    axes = [jnp.arange(shape[i]) / d[i] % 1.0 for i in range(3)]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1).astype(jnp.float32)

    k1, k2 = jax.random.split(key)
    gshape = (res[0] + 1, res[1] + 1, res[2] + 1)
    theta = 2 * jnp.pi * jax.random.uniform(k1, gshape)
    phi = 2 * jnp.pi * jax.random.uniform(k2, gshape)
    gradients = jnp.stack(
        (jnp.sin(phi) * jnp.cos(theta), jnp.sin(phi) * jnp.sin(theta), jnp.cos(phi)), axis=3
    )
    if tileable[0]:
        gradients = gradients.at[-1, :, :].set(gradients[0, :, :])
    if tileable[1]:
        gradients = gradients.at[:, -1, :].set(gradients[:, 0, :])
    if tileable[2]:
        gradients = gradients.at[:, :, -1].set(gradients[:, :, 0])
    g = jnp.repeat(jnp.repeat(jnp.repeat(gradients, d[0], 0), d[1], 1), d[2], 2)

    def corner(dx, dy, dz):
        gc = g[d[0] :] if dx else g[: -d[0]]
        gc = gc[:, d[1] :] if dy else gc[:, : -d[1]]
        gc = gc[:, :, d[2] :] if dz else gc[:, :, : -d[2]]
        offs = grid - jnp.array([dx, dy, dz], jnp.float32)
        return jnp.sum(offs * gc, axis=3)

    n000, n100 = corner(0, 0, 0), corner(1, 0, 0)
    n010, n110 = corner(0, 1, 0), corner(1, 1, 0)
    n001, n101 = corner(0, 0, 1), corner(1, 0, 1)
    n011, n111 = corner(0, 1, 1), corner(1, 1, 1)

    t = _perlinterpolant(grid)
    n00 = n000 * (1 - t[..., 0]) + t[..., 0] * n100
    n10 = n010 * (1 - t[..., 0]) + t[..., 0] * n110
    n01 = n001 * (1 - t[..., 0]) + t[..., 0] * n101
    n11 = n011 * (1 - t[..., 0]) + t[..., 0] * n111
    n0 = (1 - t[..., 1]) * n00 + t[..., 1] * n10
    n1 = (1 - t[..., 1]) * n01 + t[..., 1] * n11
    out = (1 - t[..., 2]) * n0 + t[..., 2] * n1
    return out * 2.0 - 1.0


def _interp(t):
    return 3 * t**2 - 2 * t**3


def perlin2d(key, width: int, height: int, scale: int = 10) -> jax.Array:
    """2-D gradient noise tile of shape (width*scale, height*scale)
    (`maua/ops/noise.py:94-106`)."""
    gx, gy = jax.random.normal(key, (2, width + 1, height + 1, 1, 1))
    xs = jnp.linspace(0, 1, scale + 1)[:-1][:, None]
    ys = jnp.linspace(0, 1, scale + 1)[None, :-1]
    wx = 1 - _interp(xs)
    wy = 1 - _interp(ys)
    dots = wx * wy * (gx[:-1, :-1] * xs + gy[:-1, :-1] * ys)
    dots += (1 - wx) * wy * (-gx[1:, :-1] * (1 - xs) + gy[1:, :-1] * ys)
    dots += wx * (1 - wy) * (gx[:-1, 1:] * xs - gy[:-1, 1:] * (1 - ys))
    dots += (1 - wx) * (1 - wy) * (-gx[1:, 1:] * (1 - xs) - gy[1:, 1:] * (1 - ys))
    return dots.transpose(0, 2, 1, 3).reshape(width * scale, height * scale)


def create_perlin_noise(key, octaves=(1, 1, 1, 1), width: int = 2, height: int = 2, grayscale: bool = True) -> jax.Array:
    """Multiscale 2-D perlin image, (H, W, C) in [0, 1]
    (`maua/ops/noise.py:109-132`)."""
    channels = 1 if grayscale else 3
    outs = []
    for c in range(channels):
        acc = 0.5
        scale = 2 ** len(octaves)
        ow, oh = width, height
        for i, octv in enumerate(octaves):
            k = jax.random.fold_in(key, c * 1000 + i)
            p = perlin2d(k, ow, oh, scale)
            acc = acc + p * octv
            scale //= 2
            ow *= 2
            oh *= 2
        outs.append(acc)
    img = jnp.stack(outs, axis=-1)
    img = jnp.clip(img, 0, 1)
    # autocontrast
    img = (img - img.min()) / jnp.maximum(img.max() - img.min(), 1e-8)
    if grayscale:
        img = jnp.tile(img, (1, 1, 3))
    return img
