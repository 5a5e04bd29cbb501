"""waifu2x architectures (UpConv_7 + CARN), functional JAX.

Rebuild of the nets behind `maua/super/image/models/waifu.py:19-60`
(nagadomi waifu2x UpConv_7 via the stripped submodule's pytorch port,
plus its CARN_V2 variant): 2x anime/photo upscalers with per-noise
checkpoints.

UpConv_7 is exact: six valid 3x3 convs + lrelu(0.1) over a 7px
replicate-padded input, then a 4x4 stride-2 transposed conv to RGB —
output is exactly 2H x 2W. Weights convert from the waifu2x JSON
checkpoint format (the format the reference loads at waifu.py:26) or a
torch-port state dict. CARN follows Ahn et al. 2018 with the waifu2x
V2 tweaks (SE blocks, lrelu 0.1, 3 cascading groups of 3 residual-E
blocks, pixel-shuffle 2x tail).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .rrdbnet import _conv_init, conv

UPCONV7_CHANNELS = (3, 16, 32, 64, 128, 128, 256)


@dataclasses.dataclass(frozen=True)
class UpConv7Config:
    scale: int = 2
    offset: int = 7  # replicate pre-pad consumed by the valid convs


def init_upconv7_params(key) -> Dict:
    ks = jax.random.split(key, 7)
    p = {f"conv{i}": _conv_init(ks[i], UPCONV7_CHANNELS[i], UPCONV7_CHANNELS[i + 1])
         for i in range(6)}
    # transposed conv 256 -> 3, kernel 4, stride 2, torch padding 3
    p["deconv"] = {"w": jax.random.normal(ks[6], (4, 4, 256, 3)) * 0.01, "b": jnp.zeros((3,))}
    return p


def upconv7_forward(params: Dict, img: jax.Array, cfg: UpConv7Config = UpConv7Config()) -> jax.Array:
    """img (B, H, W, 3) in [0, 1] -> (B, 2H, 2W, 3)."""
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
    x = jnp.pad(img.astype(jnp.float32), ((0, 0), (cfg.offset,) * 2, (cfg.offset,) * 2, (0, 0)), mode="edge")
    for i in range(6):
        x = lrelu(conv(params[f"conv{i}"], x, padding=0))
    # ConvTranspose2d(k=4, s=2, p=3) == lhs-dilated conv, flipped kernel,
    # zero valid padding: (in-1)*2+1 - 3 = 2*in - 4 = 2H (in = H + 2)
    w = params["deconv"]["w"][::-1, ::-1].astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["deconv"]["b"].astype(x.dtype)
    return x


def upconv7_params_from_json(obj) -> Dict:
    """waifu2x JSON checkpoint (list of layers with nested-list
    'weight' [out][in][kh][kw] and 'bias') -> pytree."""
    if isinstance(obj, str):
        with open(obj) as f:
            obj = json.load(f)
    params = {}
    for i, layer in enumerate(obj[:6]):
        w = np.asarray(layer["weight"], np.float32)  # (out, in, kh, kw)
        params[f"conv{i}"] = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                              "b": jnp.asarray(np.asarray(layer["bias"], np.float32))}
    d = obj[6]
    w = np.asarray(d["weight"], np.float32)  # ConvTranspose: (in, out, kh, kw)
    params["deconv"] = {"w": jnp.asarray(w.transpose(2, 3, 0, 1)),
                        "b": jnp.asarray(np.asarray(d["bias"], np.float32))}
    return params


def upconv7_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """Torch-port state dict (Sequential conv indices) -> pytree."""
    convs = [k[: -len(".weight")] for k in sd if k.endswith(".weight")]
    convs.sort(key=lambda n: [int(t) if t.isdigit() else t for t in n.split(".")])
    params = {}
    for i, name in enumerate(convs[:6]):
        params[f"conv{i}"] = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))),
                              "b": jnp.asarray(sd[f"{name}.bias"])}
    name = convs[6]
    params["deconv"] = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 0, 1))),
                        "b": jnp.asarray(sd[f"{name}.bias"])}
    return params


# ------------------------------------------------------------- CARN
@dataclasses.dataclass(frozen=True)
class CARNConfig:
    mid: int = 64
    n_groups: int = 3
    n_blocks: int = 3
    scale: int = 2
    se_reduction: int = 16


def _se_init(key, c, r):
    k1, k2 = jax.random.split(key)
    return {"fc1": _conv_init(k1, c, max(c // r, 4), k=1), "fc2": _conv_init(k2, max(c // r, 4), c, k=1)}


def _se(p, x):
    s = x.mean((1, 2), keepdims=True)
    s = jax.nn.relu(conv(p["fc1"], s, padding=0))
    s = jax.nn.sigmoid(conv(p["fc2"], s, padding=0))
    return x * s


def init_carn_params(key, cfg: CARNConfig = CARNConfig()) -> Dict:
    keys = iter(jax.random.split(key, 64))
    nk = lambda: next(keys)
    m = cfg.mid
    groups = []
    for _ in range(cfg.n_groups):
        blocks = [{"conv1": _conv_init(nk(), m, m), "conv2": _conv_init(nk(), m, m),
                   "se": _se_init(nk(), m, cfg.se_reduction)} for _ in range(cfg.n_blocks)]
        cascades = [_conv_init(nk(), m * (i + 2), m, k=1) for i in range(cfg.n_blocks)]
        groups.append({"blocks": blocks, "cascades": cascades})
    net_cascades = [_conv_init(nk(), m * (i + 2), m, k=1) for i in range(cfg.n_groups)]
    return {
        "entry": _conv_init(nk(), 3, m),
        "groups": groups,
        "net_cascades": net_cascades,
        "up": _conv_init(nk(), m, m * cfg.scale ** 2),
        "exit": _conv_init(nk(), m, 3),
    }


def carn_forward(params: Dict, img: jax.Array, cfg: CARNConfig = CARNConfig()) -> jax.Array:
    """img (B, H, W, 3) in [0, 1] -> (B, scale*H, scale*W, 3)."""
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
    x = lrelu(conv(params["entry"], img.astype(jnp.float32)))
    feats = [x]
    for g in params["groups"]:
        y = x
        g_feats = [y]
        for blk, cas in zip(g["blocks"], g["cascades"]):
            r = lrelu(conv(blk["conv2"], lrelu(conv(blk["conv1"], y))))
            r = _se(blk["se"], r)
            y = lrelu(r + y)
            g_feats.append(y)
            y = lrelu(conv(cas, jnp.concatenate(g_feats, -1), padding=0))
        x = y
        feats.append(x)
        x = lrelu(conv(params["net_cascades"][len(feats) - 2], jnp.concatenate(feats, -1), padding=0))
    x = lrelu(conv(params["up"], x))
    b, h, w, c = x.shape
    r = cfg.scale
    x = x.reshape(b, h, w, c // r ** 2, r, r).transpose(0, 1, 4, 2, 5, 3).reshape(b, h * r, w * r, c // r ** 2)
    return conv(params["exit"], x)
