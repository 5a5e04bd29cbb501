"""StyleGAN2 discriminator, pure-functional JAX.

The reference's training discriminator lives in the empty `GAN/nv`
submodule (SURVEY.md section 2.3); this is a from-scratch functional
implementation of the standard StyleGAN2/ADA discriminator
architecture (resnet blocks, minibatch-std, epilogue FCs) sharing the
TPU-native conv primitives in `gan/ops`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ops


@dataclasses.dataclass(frozen=True)
class D2Config:
    img_resolution: int = 256
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: str = "float32"

    @property
    def block_resolutions(self) -> Tuple[int, ...]:
        log2 = int(math.log2(self.img_resolution))
        return tuple(2**i for i in range(log2, 2, -1))  # img_res ... 8

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)


def _conv_init(key, kh, kw, ci, co):
    return jax.random.normal(key, (kh, kw, ci, co), jnp.float32)


def init_params(key, cfg: D2Config) -> Dict:
    params = {}
    keys = jax.random.split(key, len(cfg.block_resolutions) + 3)
    c_in = cfg.channels(cfg.img_resolution)
    params["fromrgb"] = {
        "weight": _conv_init(keys[0], 1, 1, cfg.img_channels, c_in),
        "bias": jnp.zeros((c_in,), jnp.float32),
    }
    for i, res in enumerate(cfg.block_resolutions):
        ci = cfg.channels(res)
        cmid = cfg.channels(res)
        co = cfg.channels(res // 2)
        k = jax.random.split(keys[i + 1], 3)
        params[f"b{res}"] = {
            "conv0": {"weight": _conv_init(k[0], 3, 3, ci, cmid), "bias": jnp.zeros((cmid,))},
            "conv1": {"weight": _conv_init(k[1], 3, 3, cmid, co), "bias": jnp.zeros((co,))},
            "skip": {"weight": _conv_init(k[2], 1, 1, ci, co)},
        }
    c4 = cfg.channels(4)
    kk = jax.random.split(keys[-1], 3)
    params["b4"] = {
        "conv": {"weight": _conv_init(kk[0], 3, 3, c4 + cfg.mbstd_num_channels, c4), "bias": jnp.zeros((c4,))},
        "fc": {"w": jax.random.normal(kk[1], (c4 * 16, c4), jnp.float32), "b": jnp.zeros((c4,))},
        "out": {"w": jax.random.normal(kk[2], (c4, 1), jnp.float32), "b": jnp.zeros((1,))},
    }
    return params


def _conv(x, w, bias=None, act="lrelu", down=1, rfilter=None, gain=1.0):
    wg = 1.0 / math.sqrt(np.prod(w.shape[:3]))
    y = ops.conv2d_resample(x, (w * wg).astype(x.dtype), f=rfilter, down=down, padding=w.shape[0] // 2)
    return ops.bias_act(y, None if bias is None else bias.astype(x.dtype), act=act,
                        gain=ops.activation_gain(act) * gain if act != "linear" else gain)


def minibatch_stddev(x: jax.Array, group_size: int, num_channels: int) -> jax.Array:
    """Append per-group feature stddev channels (ADA epilogue)."""
    n, h, w, c = x.shape
    g = min(group_size, n)
    while n % g != 0:
        g -= 1
    f = num_channels
    cg = c // f
    y = x.reshape(g, n // g, h, w, f, cg).astype(jnp.float32)
    y = y - y.mean(axis=0, keepdims=True)
    y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + 1e-8)
    y = y.mean(axis=(1, 2, 4))  # (n//g, f)
    y = jnp.tile(y[:, None, None, :], (g, h, w, 1)).reshape(n, h, w, f)
    return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


def discriminator(params: Dict, img: jax.Array, cfg: D2Config) -> jax.Array:
    """img (B, H, W, C) in [-1, 1] -> logits (B, 1)."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    rfilter = ops.setup_filter(list(cfg.resample_filter))
    x = _conv(img.astype(dtype), params["fromrgb"]["weight"], params["fromrgb"]["bias"], act="lrelu")
    for res in cfg.block_resolutions:
        b = params[f"b{res}"]
        y = _conv(x, b["skip"]["weight"], act="linear", down=2, rfilter=rfilter, gain=math.sqrt(0.5))
        x = _conv(x, b["conv0"]["weight"], b["conv0"]["bias"], act="lrelu")
        x = _conv(x, b["conv1"]["weight"], b["conv1"]["bias"], act="lrelu", down=2, rfilter=rfilter,
                  gain=math.sqrt(0.5))
        x = x + y
    x = x.astype(jnp.float32)
    x = minibatch_stddev(x, cfg.mbstd_group_size, cfg.mbstd_num_channels)
    b4 = params["b4"]
    x = _conv(x, b4["conv"]["weight"], b4["conv"]["bias"], act="lrelu")
    x = x.reshape(x.shape[0], -1)
    wg = 1.0 / math.sqrt(b4["fc"]["w"].shape[0])
    x = ops.bias_act(x @ (b4["fc"]["w"] * wg), b4["fc"]["b"], act="lrelu")
    wg = 1.0 / math.sqrt(b4["out"]["w"].shape[0])
    return x @ (b4["out"]["w"] * wg) + b4["out"]["b"]
