"""StyleGAN w-latent parameterization
(`maua/parameterizations/stylegan.py`): optimize w+ latents decoded
through a (frozen) StyleGAN2 synthesis network."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..gan import stylegan2 as sg2
from . import Parameterization


class StyleGANLatent(Parameterization):
    def __init__(self, height, width, tensor=None, generator: Optional[sg2.Generator] = None, ema: bool = False,
                 key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        if generator is None:
            cfg = sg2.SG2Config(img_resolution=min(height, width), num_fp16_res=0)
            generator = sg2.Generator(cfg, key=key)
        self.generator = generator
        if tensor is None:
            z = jax.random.normal(jax.random.fold_in(key, 1), (1, generator.cfg.z_dim))
            tensor = generator.mapping(z)
        super().__init__(height, width, jnp.asarray(tensor), ema)

    def decode(self, tensor=None) -> jax.Array:
        ws = self.tensor if tensor is None else tensor
        img = sg2.synthesis(self.generator.params, ws, self.generator.cfg, noise_mode="none")
        if img.shape[1] != self.h or img.shape[2] != self.w:
            img = jax.image.resize(img, (img.shape[0], self.h, self.w, img.shape[3]), "bilinear")
        return img

    def encode(self, img):
        raise NotImplementedError("use projection (optimize w) to encode an image")
