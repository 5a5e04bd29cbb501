"""Lazy per-window noise generators for self-supervised patches.

Rebuild of `selfsupervised/noise.py:4-140` (Loop/Blend/Multiply/
Average/Modulate/ScaleBias + noise_patch): each module computes only
the (i, i+b) window of its (T, H, W) noise video on demand, so
1024^2-scale noise never materializes fully.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


class Noise:
    def __init__(self, length: int, size):
        self.length = length
        self.size = tuple(size)

    def __call__(self, i: int, b: int) -> jax.Array:
        raise NotImplementedError


class Loop(Noise):
    """Smooth sinusoidal noise loop (`noise.py:43-56`)."""

    def __init__(self, key, length, size, n_loops: float = 1.0, sigma: float = 5.0):
        super().__init__(length, size)
        self.sigma = sigma
        self.noise = jax.random.normal(key, (3, size[0], size[1]))
        self.idx = jnp.linspace(0, float(n_loops) * 2 * np.pi, length)

    def __call__(self, i, b):
        freqs = jnp.cos(self.idx[i : i + b, None, None] + self.noise[0][None]) / (self.sigma / 50.0)
        out = jnp.sin(freqs + self.noise[1][None]) * self.noise[2][None]
        rmsv = jnp.sqrt(jnp.mean(jnp.square(out), axis=(1, 2), keepdims=True))
        return out / (rmsv + jnp.finfo(out.dtype).eps)


class Blend(Noise):
    """Feature-blended pair of noise banks (`noise.py:11-25`)."""

    def __init__(self, key, length, size, modulator):
        super().__init__(length, size)
        self.noise = jax.random.normal(key, (2, modulator.shape[1], size[0], size[1]))
        self.modulator = jnp.asarray(modulator)

    def __call__(self, i, b):
        mod = self.modulator[i : i + b].reshape(-1, self.modulator.shape[1])
        left = jnp.einsum("MHW,BM->BHW", self.noise[0], mod)
        right = jnp.einsum("MHW,BM->BHW", self.noise[1], 1 - mod)
        return left + right


class Multiply(Noise):
    """(`noise.py:28-40`)"""

    def __init__(self, key, length, size, modulator):
        super().__init__(length, size)
        self.noise = jax.random.normal(key, (modulator.shape[1], size[0], size[1]))
        self.modulator = jnp.asarray(modulator)

    def __call__(self, i, b):
        mod = self.modulator[i : i + b].reshape(-1, self.modulator.shape[1])
        return jnp.einsum("MHW,BM->BHW", self.noise, mod)


class Average(Noise):
    def __init__(self, left, right):
        super().__init__(left.length, left.size)
        self.left, self.right = left, right

    def __call__(self, i, b):
        return (self.left(i, b) + self.right(i, b)) / 2


class Modulate(Noise):
    def __init__(self, left, right, modulator):
        super().__init__(left.length, left.size)
        self.left, self.right = left, right
        self.modulator = jnp.asarray(modulator).mean(axis=1)

    def __call__(self, i, b):
        mod = self.modulator[i : i + b][:, None, None]
        return self.left(i, b) * mod + self.right(i, b) * (1 - mod)


class ScaleBias(Noise):
    def __init__(self, base, scale, bias):
        super().__init__(base.length, base.size)
        self.base, self.scale, self.bias = base, scale, bias

    def __call__(self, i, b):
        return self.scale * self.base(i, b) + self.bias


def noise_patch(
    key,
    noise: List[Noise],
    features: Dict,
    tempo: float,
    fps: float,
    patch_type: str,
    loop_bars: int,
    seq_feat: str,
    seq_feat_weight: float,
    mod_feat: str,
    mod_feat_weight: float,
    merge_type: str,
    merge_depth: str,
    noise_mean: float,
    noise_std: float,
) -> List[Noise]:
    """Apply one random noise subpatch to the per-layer stack
    (`noise.py:90-140`)."""
    n_layers = len(noise)
    ranges = {
        "low": range(0, min(6, n_layers)),
        "mid": range(min(6, n_layers), min(12, n_layers)),
        "high": range(min(12, n_layers), n_layers),
        "lowmid": range(0, min(12, n_layers)),
        "midhigh": range(min(6, n_layers), n_layers),
        "all": range(0, n_layers),
    }
    lays = ranges[merge_depth]
    feature = seq_feat_weight * jnp.asarray(features[seq_feat])

    for li, n in enumerate(lays):
        sub = jax.random.fold_in(key, n)
        if patch_type == "blend":
            new_noise = Blend(sub, len(feature), noise[n].size, feature)
        elif patch_type == "multiply":
            new_noise = Multiply(sub, len(feature), noise[n].size, feature)
        else:  # loop
            n_loops = max(len(feature) / fps * max(tempo, 1e-3) / 60 / 4 / loop_bars, 0.25)
            new_noise = Loop(sub, len(feature), noise[n].size, n_loops=n_loops)

        if merge_type == "average":
            noise[n] = Average(noise[n], new_noise)
        elif merge_type == "modulate":
            noise[n] = Modulate(noise[n], new_noise, mod_feat_weight * jnp.asarray(features[mod_feat]))
        else:
            noise[n] = new_noise
        noise[n] = ScaleBias(noise[n], scale=noise_std, bias=noise_mean)
    return noise
