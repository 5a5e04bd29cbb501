"""AutoencoderKL (the SD/LDM first-stage VAE), functional JAX.

Replaces the reference's CompVis first-stage model (reached through
`stable.py:258-265` encode / :269 decode; weights in the stripped
stable_diffusion submodule). Standard architecture: resnet
encoder/decoder with a mid attention block, diagonal Gaussian
posterior, 0.18215 latent scale.
"""

from __future__ import annotations

import dataclasses

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...kernels.attention import attention
from .unet import _conv_init, _norm_init, _upsample_nn, conv2d, group_norm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    base_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    scale_factor: float = 0.18215
    dtype: str = "float32"

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.channel_mult) - 1)


def _init_vae_resblock(key, ci, co):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _norm_init(ci),
        "conv1": _conv_init(ks[0], 3, ci, co),
        "norm2": _norm_init(co),
        "conv2": _conv_init(ks[1], 3, co, co),
    }
    if ci != co:
        p["skip"] = _conv_init(ks[2], 1, ci, co)
    return p


def _vae_resblock(p, x):
    h = conv2d(p["conv1"], jax.nn.silu(group_norm(p["norm1"], x)))
    h = conv2d(p["conv2"], jax.nn.silu(group_norm(p["norm2"], h)))
    skip = conv2d(p["skip"], x, padding=0) if "skip" in p else x
    return skip + h


def _init_mid_attn(key, c):
    ks = jax.random.split(key, 4)
    return {
        "norm": _norm_init(c),
        "q": _conv_init(ks[0], 1, c, c),
        "k": _conv_init(ks[1], 1, c, c),
        "v": _conv_init(ks[2], 1, c, c),
        "proj": _conv_init(ks[3], 1, c, c),
    }


def _mid_attn(p, x):
    b, h, w, c = x.shape
    n = group_norm(p["norm"], x)
    q = conv2d(p["q"], n, padding=0).reshape(b, 1, h * w, c)
    k = conv2d(p["k"], n, padding=0).reshape(b, 1, h * w, c)
    v = conv2d(p["v"], n, padding=0).reshape(b, 1, h * w, c)
    out = attention(q, k, v).reshape(b, h, w, c)
    return x + conv2d(p["proj"], out, padding=0)


def init_params(key, cfg: VAEConfig) -> Dict:
    keys = iter(jax.random.split(key, 512))
    nk = lambda: next(keys)
    bc = cfg.base_channels

    # encoder
    enc = {"conv_in": _conv_init(nk(), 3, cfg.in_channels, bc)}
    ch = bc
    blocks = []
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            blocks.append({"res": _init_vae_resblock(nk(), ch, mult * bc)})
            ch = mult * bc
        if level != len(cfg.channel_mult) - 1:
            blocks.append({"down": _conv_init(nk(), 3, ch, ch)})
    enc["blocks"] = blocks
    enc["mid"] = {
        "res1": _init_vae_resblock(nk(), ch, ch),
        "attn": _init_mid_attn(nk(), ch),
        "res2": _init_vae_resblock(nk(), ch, ch),
    }
    enc["norm_out"] = _norm_init(ch)
    enc["conv_out"] = _conv_init(nk(), 3, ch, 2 * cfg.z_channels)
    enc["quant_conv"] = _conv_init(nk(), 1, 2 * cfg.z_channels, 2 * cfg.z_channels)

    # decoder
    dec = {
        "post_quant_conv": _conv_init(nk(), 1, cfg.z_channels, cfg.z_channels),
        "conv_in": _conv_init(nk(), 3, cfg.z_channels, ch),
    }
    dec["mid"] = {
        "res1": _init_vae_resblock(nk(), ch, ch),
        "attn": _init_mid_attn(nk(), ch),
        "res2": _init_vae_resblock(nk(), ch, ch),
    }
    dblocks = []
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for _ in range(cfg.num_res_blocks + 1):
            dblocks.append({"res": _init_vae_resblock(nk(), ch, mult * bc)})
            ch = mult * bc
        if level != 0:
            dblocks.append({"up": _conv_init(nk(), 3, ch, ch)})
    dec["blocks"] = dblocks
    dec["norm_out"] = _norm_init(ch)
    dec["conv_out"] = _conv_init(nk(), 3, ch, cfg.in_channels)
    return {"encoder": enc, "decoder": dec}


def encode_moments(params: Dict, img: jax.Array, cfg: VAEConfig) -> Tuple[jax.Array, jax.Array]:
    """img (B,H,W,3) in [-1,1] -> (mean, logvar) of the latent
    posterior."""
    p = params["encoder"]
    h = conv2d(p["conv_in"], img.astype(cfg.dtype == "bfloat16" and jnp.bfloat16 or jnp.float32))
    for blk in p["blocks"]:
        if "down" in blk:
            h = conv2d(blk["down"], jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0))), stride=2, padding=0)
        else:
            h = _vae_resblock(blk["res"], h)
    h = _vae_resblock(p["mid"]["res1"], h)
    h = _mid_attn(p["mid"]["attn"], h)
    h = _vae_resblock(p["mid"]["res2"], h)
    h = conv2d(p["conv_out"], jax.nn.silu(group_norm(p["norm_out"], h)))
    h = conv2d(p["quant_conv"], h, padding=0)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean.astype(jnp.float32), jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)


def encode(params: Dict, img: jax.Array, cfg: VAEConfig, key=None, sample: bool = False) -> jax.Array:
    """-> scaled latent (`stable.py:258` get_first_stage_encoding)."""
    mean, logvar = encode_moments(params, img, cfg)
    if sample and key is not None:
        mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
    return cfg.scale_factor * mean


def decode(params: Dict, z: jax.Array, cfg: VAEConfig) -> jax.Array:
    """scaled latent -> image in [-1, 1] (`stable.py:269`)."""
    p = params["decoder"]
    z = z / cfg.scale_factor
    h = conv2d(p["post_quant_conv"], z, padding=0)
    h = conv2d(p["conv_in"], h)
    h = _vae_resblock(p["mid"]["res1"], h)
    h = _mid_attn(p["mid"]["attn"], h)
    h = _vae_resblock(p["mid"]["res2"], h)
    for blk in p["blocks"]:
        if "up" in blk:
            h = conv2d(blk["up"], _upsample_nn(h))
        else:
            h = _vae_resblock(blk["res"], h)
    h = conv2d(p["conv_out"], jax.nn.silu(group_norm(p["norm_out"], h)))
    return h.astype(jnp.float32)
