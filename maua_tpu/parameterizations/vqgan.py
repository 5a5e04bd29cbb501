"""Latent-space parameterization with straight-through vector
quantization (`maua/parameterizations/vqgan.py:98-136`).

The reference optimizes VQGAN z-space and decodes through the taming
VQGAN decoder (stripped submodule). Here the decoder is pluggable —
by default this package's AutoencoderKL decoder (the in-tree latent
decoder); pass `decode_fn` to use a converted VQGAN."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..loss import replace_grad
from . import Parameterization


class VQGAN(Parameterization):
    def __init__(self, height, width, tensor=None, codebook: Optional[jax.Array] = None,
                 decode_fn: Optional[Callable] = None, encode_fn: Optional[Callable] = None,
                 ema: bool = False, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        if decode_fn is None:
            from ..diffusion.models import vae as vae_mod

            cfg = vae_mod.VAEConfig(base_channels=32, channel_mult=(1, 2, 4), num_res_blocks=1)
            params = vae_mod.init_params(key, cfg)
            decode_fn = lambda z: vae_mod.decode(params, z, cfg)
            if encode_fn is None:
                encode_fn = lambda im: vae_mod.encode(params, im, cfg)
            downscale = cfg.downscale
            z_ch = cfg.z_channels
        else:
            downscale, z_ch = 8, 4
        self.decode_fn = decode_fn
        self.encode_fn = encode_fn
        zh, zw = height // downscale, width // downscale
        if tensor is None:
            tensor = jax.random.normal(jax.random.fold_in(key, 1), (1, zh, zw, z_ch)) * 0.1
        super().__init__(height, width, jnp.asarray(tensor), ema)
        if codebook is None:
            codebook = jax.random.normal(jax.random.fold_in(key, 2), (256, z_ch))
        self.codebook = codebook

    def quantize(self, z: jax.Array) -> jax.Array:
        """Straight-through nearest-codebook-entry quantization
        (`vqgan.py:104-118`)."""
        flat = z.reshape(-1, z.shape[-1])
        d = (
            jnp.sum(flat**2, -1, keepdims=True)
            - 2 * flat @ self.codebook.T
            + jnp.sum(self.codebook**2, -1)[None]
        )
        idx = jnp.argmin(d, -1)
        zq = self.codebook[idx].reshape(z.shape)
        return replace_grad(zq, z)

    def decode(self, tensor=None) -> jax.Array:
        z = self.tensor if tensor is None else tensor
        return jnp.clip(self.decode_fn(self.quantize(z)), -1.0, 1.0)

    def encode(self, img):
        """Initialize z-space from an image through the encoder +
        quantizer (`maua/parameterizations/vqgan.py:120-129`). `img`
        (B, H, W, 3) in [-1, 1]."""
        if self.encode_fn is None:
            raise NotImplementedError(
                "this VQGAN was built with a custom decode_fn and no encode_fn; pass encode_fn="
            )
        z = self.encode_fn(jnp.asarray(img))
        self.tensor = self.quantize(z)
        return self.tensor
