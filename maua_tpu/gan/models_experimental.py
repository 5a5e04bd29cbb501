"""Additional / experimental GAN architectures for the training
harness.

Rebuild of `maua/GAN/training/models/` (DCGAN G/D
`deepconvolutional.py:14-75`; experimental StyleHyperMixerFly /
optstyle with the emerging-convolution inverse). The plugin registry
in `gan/train_cli.py` exposes them like the reference's reflection
system.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- DCGAN
def _convt_init(key, k, ci, co):
    return {"w": jax.random.normal(key, (k, k, ci, co)) * 0.02, "b": jnp.zeros((co,))}


def init_dcgan_g(key, z_dim: int = 100, base: int = 64, resolution: int = 64) -> Dict:
    """DCGAN generator (`models/deepconvolutional.py:14-44`)."""
    n_up = int(math.log2(resolution // 4))
    keys = iter(jax.random.split(key, n_up + 2))
    chans = [base * 2**i for i in range(n_up, -1, -1)]
    p = {"proj": _convt_init(next(keys), 4, z_dim, chans[0]), "ups": []}
    for i in range(n_up):
        p["ups"].append(_convt_init(next(keys), 4, chans[i], chans[i + 1] if i < n_up - 1 else base))
    p["out"] = _convt_init(next(keys), 3, base, 3)
    return p


def dcgan_g(params: Dict, z: jax.Array) -> jax.Array:
    """z (B, z_dim) -> (B, R, R, 3) in [-1, 1]."""
    x = z[:, None, None, :]
    w = params["proj"]["w"]
    x = jax.lax.conv_general_dilated(
        x, w, (1, 1), padding=((3, 3), (3, 3)), lhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["proj"]["b"]
    x = jax.nn.relu(x)
    for p in params["ups"]:
        b, h, wd, c = x.shape
        x = jax.image.resize(x, (b, h * 2, wd * 2, c), "nearest")
        x = jax.lax.conv_general_dilated(
            x, p["w"], (1, 1), ((1, 2), (1, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + p["b"]
        x = jax.nn.relu(x)
    x = jax.lax.conv_general_dilated(
        x, params["out"]["w"], (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + params["out"]["b"]
    return jnp.tanh(x)


def init_dcgan_d(key, base: int = 64, resolution: int = 64) -> Dict:
    """DCGAN discriminator (`models/deepconvolutional.py:47-75`)."""
    n_down = int(math.log2(resolution // 4))
    keys = iter(jax.random.split(key, n_down + 2))
    p = {"inp": _convt_init(next(keys), 4, 3, base), "downs": []}
    ch = base
    for i in range(n_down - 1):
        p["downs"].append(_convt_init(next(keys), 4, ch, ch * 2))
        ch *= 2
    p["out"] = _convt_init(next(keys), 4, ch, 1)
    return p


def dcgan_d(params: Dict, img: jax.Array) -> jax.Array:
    conv = lambda p, x, s: jax.lax.conv_general_dilated(
        x, p["w"], (s, s), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + p["b"]
    x = jax.nn.leaky_relu(conv(params["inp"], img, 2), 0.2)
    for p in params["downs"]:
        x = jax.nn.leaky_relu(conv(p, x, 2), 0.2)
    x = conv(params["out"], x, 1)
    return x.mean(axis=(1, 2))


# -------------------------------------------- optstyle emerging convs
def masked_emerging_weight(key, channels: int, ksize: int = 3, is_upper: bool = False) -> jnp.ndarray:
    """Autoregressive masked conv weight whose inverse the native
    kernel computes (`models/experimental/optstyle/`): triangular
    center tap + one-sided spatial taps."""
    kc = (ksize - 1) // 2
    w = jax.random.normal(key, (ksize, ksize, channels, channels)) * 0.1
    spatial_mask = np.zeros((ksize, ksize, 1, 1), np.float32)
    for kk in range(ksize):
        for mm in range(ksize):
            if is_upper:
                solved = (kk < kc) or (kk == kc and mm < kc)
            else:
                solved = (kk > kc) or (kk == kc and mm > kc)
            if solved:
                spatial_mask[kk, mm] = 1.0
    center_mask = np.tril(np.ones((channels, channels)), -1) if is_upper else np.triu(np.ones((channels, channels)), 1)
    w = w * jnp.asarray(spatial_mask)
    center = jax.random.normal(jax.random.fold_in(key, 1), (channels, channels)) * 0.1
    diag = 1.0 + jax.random.uniform(jax.random.fold_in(key, 2), (channels,))
    w = w.at[kc, kc].set(center * jnp.asarray(center_mask) + jnp.diag(diag))
    return w


def emerging_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Forward masked conv (invertible; see native.inverse_conv)."""
    pad = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def emerging_conv_inverse(z, w, is_upper: bool = False):
    """Host-side exact inverse via the native C++ kernel."""
    from .. import native

    return native.inverse_conv(np.asarray(z), np.asarray(w), is_upper=is_upper)


# -------------------------------------------------- StyleHyperMixer
def init_hypermixer_g(key, z_dim: int = 64, dim: int = 128, grid: int = 8, depth: int = 4,
                      resolution: int = 32) -> Dict:
    """Compact StyleHyperMixerFly-style generator
    (`models/experimental/stylehypermixerfly.py`, 513 LoC in the
    reference): token-mixing MLPs over a latent feature grid whose
    mixing weights are HYPER-generated from the style vector, followed
    by upsampling convs to pixels."""
    keys = iter(jax.random.split(key, depth * 3 + 16))
    nk = lambda: next(keys)
    n_tok = grid * grid
    p = {
        "seed": jax.random.normal(nk(), (n_tok, dim)) * 0.1,
        "style": {"w": jax.random.normal(nk(), (z_dim, dim)) / math.sqrt(z_dim), "b": jnp.zeros((dim,))},
        "blocks": [],
    }
    for _ in range(depth):
        p["blocks"].append({
            # hypernetwork generating the token-mixing matrix from style
            "hyper": {"w": jax.random.normal(nk(), (dim, n_tok * 8)) / math.sqrt(dim), "b": jnp.zeros((n_tok * 8,))},
            "mix_proj": {"w": jax.random.normal(nk(), (8, n_tok)) / math.sqrt(8.0)},
            "channel": {"w": jax.random.normal(nk(), (dim, dim)) / math.sqrt(dim), "b": jnp.zeros((dim,))},
        })
    n_up = int(math.log2(resolution // grid))
    p["ups"] = [_convt_init(nk(), 3, dim if i == 0 else 64, 64) for i in range(n_up)]
    p["out"] = _convt_init(nk(), 3, 64 if n_up else dim, 3)
    return p


def hypermixer_g(params: Dict, z: jax.Array, grid: int = 8) -> jax.Array:
    b = z.shape[0]
    style = jnp.tanh(z @ params["style"]["w"] + params["style"]["b"])  # (B, dim)
    x = jnp.tile(params["seed"][None], (b, 1, 1)) + style[:, None, :]
    n_tok = x.shape[1]
    for blk in params["blocks"]:
        h = style @ blk["hyper"]["w"] + blk["hyper"]["b"]  # (B, n_tok*8)
        mix = jnp.tanh(h.reshape(b, n_tok, 8) @ blk["mix_proj"]["w"])  # (B, n_tok, n_tok)
        x = x + jnp.einsum("bts,bsd->btd", jax.nn.softmax(mix, -1), x)
        x = x + jax.nn.gelu(x @ blk["channel"]["w"] + blk["channel"]["b"])
    img = x.reshape(b, grid, grid, -1)
    for p in params["ups"]:
        bb, hh, ww, cc = img.shape
        img = jax.image.resize(img, (bb, hh * 2, ww * 2, cc), "nearest")
        img = jax.nn.relu(jax.lax.conv_general_dilated(
            img, p["w"], (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"])
    img = jax.lax.conv_general_dilated(
        img, params["out"]["w"], (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + params["out"]["b"]
    return jnp.tanh(img)
