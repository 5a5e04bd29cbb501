"""VQ image-token decoder: token grids -> pixels.

The reference decodes CogVideo/ru-dalle image tokens through icetk /
VQGAN decoders living in stripped submodules (used at
`cog/video/generate.py:716-721` `tokenizer.decode(image_ids=...)`).
Here the decoder is the package's own AutoencoderKL decoder
(`diffusion/models/vae.py`, taming-style resblock+upsample stack) fed
by a codebook embed — so converted taming/CompVis VQGAN weights slot
straight in via `diffusion.load.vae_params_from_compvis` plus the
`quantize.embedding.weight` codebook.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.models import vae as vae_mod


@dataclasses.dataclass(frozen=True)
class VQConfig:
    codebook_size: int = 8192
    z_channels: int = 4
    base_channels: int = 32
    channel_mult: tuple = (1, 2, 4)
    num_res_blocks: int = 1

    @property
    def vae_cfg(self) -> vae_mod.VAEConfig:
        return vae_mod.VAEConfig(
            base_channels=self.base_channels,
            channel_mult=self.channel_mult,
            num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels,
            scale_factor=1.0,
        )

    @property
    def upscale(self) -> int:
        return self.vae_cfg.downscale


def init_params(key, cfg: VQConfig) -> Dict:
    k_code, k_vae = jax.random.split(key)
    return {
        "codebook": jax.random.normal(k_code, (cfg.codebook_size, cfg.z_channels)) * 0.1,
        "vae": vae_mod.init_params(k_vae, cfg.vae_cfg),
    }


def params_from_torch(sd, cfg: VQConfig) -> Dict:
    """Taming-VQGAN state dict -> VQ decoder params: codebook from
    `quantize.embedding.weight`, decoder via the CompVis VAE converter
    (both share the resblock+upsample decoder structure)."""
    from ..diffusion.load import vae_params_from_compvis

    sd = {k: np.asarray(v) for k, v in sd.items()}
    return {
        "codebook": jnp.asarray(sd["quantize.embedding.weight"], jnp.float32),
        "vae": vae_params_from_compvis(sd, cfg.vae_cfg),
    }


def decode_tokens(params: Dict, tokens: jax.Array, cfg: VQConfig, rows: int, cols: int) -> jax.Array:
    """tokens (B, rows*cols) image-vocab ids -> (B, rows*U, cols*U, 3)
    in [-1, 1]."""
    z = params["codebook"][tokens].reshape(tokens.shape[0], rows, cols, cfg.z_channels)
    return jnp.clip(vae_mod.decode(params["vae"], z, cfg.vae_cfg), -1.0, 1.0)


def decode_video_tokens(params: Dict, tokens: jax.Array, cfg: VQConfig, rows: int, cols: int) -> jax.Array:
    """tokens (F, B, rows*cols) -> (F, B, H, W, 3): frames fold into the
    batch for one big MXU-friendly decode, like the reference's
    per-frame `tokenizer.decode` loop collapsed into a single call."""
    f, b, l = tokens.shape
    imgs = decode_tokens(params, tokens.reshape(f * b, l), cfg, rows, cols)
    return imgs.reshape(f, b, *imgs.shape[1:])


def decode_rq_tokens(params: Dict, tokens: jax.Array, cfg: VQConfig, rows: int, cols: int,
                     depth: int) -> jax.Array:
    """Residual-quantized tokens (B, rows*cols*depth, raster-depth
    order) -> (B, rows*U, cols*U, 3).

    RQ-VAE (the reference's rq_dalle role, `rq_dalle.py:113-217`:
    sample grids are (H, W, D)) represents each position as a DEPTH-D
    stack of codes quantizing successive residuals against one shared
    codebook; the latent is the sum of the code embeddings, decoded by
    the same decoder. depth=1 degenerates to plain VQ."""
    b = tokens.shape[0]
    ids = tokens.reshape(b, rows, cols, depth)
    z = params["codebook"][ids].sum(axis=3)  # (B, rows, cols, C)
    return jnp.clip(vae_mod.decode(params["vae"], z, cfg.vae_cfg), -1.0, 1.0)


def encode_rq_tokens(params: Dict, images: jax.Array, cfg: VQConfig, depth: int) -> jax.Array:
    """images (B, H, W, 3) -> (B, (H/U)*(W/U)*depth) residual code ids:
    each depth level snaps the remaining residual to the nearest
    codebook entry (RQ-VAE encoding)."""
    z = vae_mod.encode(params["vae"], images, cfg.vae_cfg)
    flat = z.reshape(-1, cfg.z_channels)
    cb = params["codebook"]
    levels = []
    resid = flat
    for _ in range(depth):
        d = (jnp.sum(resid**2, -1, keepdims=True) - 2.0 * resid @ cb.T + jnp.sum(cb**2, -1))
        ids = jnp.argmin(d, axis=-1)
        levels.append(ids)
        resid = resid - cb[ids]
    ids = jnp.stack(levels, axis=-1)  # (B*h*w, depth)
    return ids.reshape(images.shape[0], -1)


def encode_tokens(params: Dict, images: jax.Array, cfg: VQConfig) -> jax.Array:
    """images (B, H, W, 3) in [-1, 1] -> (B, (H/U)*(W/U)) image-vocab
    ids: encoder latents snapped to the nearest codebook entry (the
    tokenization the reference gets from taming's `encode`, used to
    build finetuning sequences in `ru_dalle/finetune.py:115-196`)."""
    z = vae_mod.encode(params["vae"], images, cfg.vae_cfg)  # (B, h, w, C)
    flat = z.reshape(-1, cfg.z_channels)
    d = (jnp.sum(flat**2, -1, keepdims=True)
         - 2.0 * flat @ params["codebook"].T
         + jnp.sum(params["codebook"] ** 2, -1))
    ids = jnp.argmin(d, axis=-1)
    return ids.reshape(images.shape[0], -1)
