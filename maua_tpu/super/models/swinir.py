"""SwinIR (window-attention transformer SR), functional JAX/TPU-native.

Rebuild of the architecture behind `maua/super/image/models/swinir.py:14-82`
(the JingyunLiang/SwinIR net reached through the stripped submodule): the
real-SR "nearest+conv" variants — M (embed 180, 6x6 blocks, 6 heads,
1conv residual) and L (embed 240, 9x6 blocks, 8 heads, 3conv residual),
window size 8, mlp ratio 2, img_range 1.0.

TPU-first design choices:
- images stay (B, H, W, C) NHWC end-to-end; window partition is a pure
  reshape/transpose (static shapes — one compile per input size, like
  the rest of the framework);
- W-MSA runs as one batched einsum over (B*nW, ws^2, C) so the MXU sees
  a single large matmul per projection rather than per-window loops;
- the shifted-window attention mask and the relative-position index are
  computed with numpy at trace time (compile-time constants folded by
  XLA), never on device;
- no dropout / drop-path (inference net), LayerNorm in f32 for
  stability with an optional bf16 trunk.

Weight conversion (`params_from_torch`) accepts the official
state-dict layout (layers.{i}.residual_group.blocks.{j}.* keys).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rrdbnet import _conv_init, conv


@dataclasses.dataclass(frozen=True)
class SwinIRConfig:
    in_chans: int = 3
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    upscale: int = 4
    img_range: float = 1.0
    resi_connection: str = "1conv"  # "1conv" | "3conv"
    num_feat: int = 64  # upsampler width
    dtype: str = "float32"


# the two variants the reference exposes (swinir.py:25-55)
SWINIR_M = SwinIRConfig()
SWINIR_L = SwinIRConfig(
    embed_dim=240, depths=(6,) * 9, num_heads=(8,) * 9, resi_connection="3conv"
)

_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], np.float32)


# ------------------------------------------------------------- params
def _linear_init(key, ci, co):
    # trunc-normal(0.02) like the reference transformer inits
    return {"w": jax.random.normal(key, (ci, co)) * 0.02, "b": jnp.zeros((co,))}


def _ln_init(dim):
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def _init_block(key, cfg: SwinIRConfig, heads: int):
    ks = jax.random.split(key, 5)
    d = cfg.embed_dim
    hidden = int(d * cfg.mlp_ratio)
    nbias = (2 * cfg.window_size - 1) ** 2
    return {
        "norm1": _ln_init(d),
        "qkv": _linear_init(ks[0], d, 3 * d),
        "proj": _linear_init(ks[1], d, d),
        "rpb": jax.random.normal(ks[2], (nbias, heads)) * 0.02,
        "norm2": _ln_init(d),
        "fc1": _linear_init(ks[3], d, hidden),
        "fc2": _linear_init(ks[4], hidden, d),
    }


def _init_resi_conv(key, cfg: SwinIRConfig):
    d = cfg.embed_dim
    if cfg.resi_connection == "1conv":
        return {"conv": _conv_init(key, d, d)}
    ks = jax.random.split(key, 3)
    return {
        "conv0": _conv_init(ks[0], d, d // 4),
        "conv1": _conv_init(ks[1], d // 4, d // 4, k=1),
        "conv2": _conv_init(ks[2], d // 4, d),
    }


def init_params(key, cfg: SwinIRConfig = SWINIR_M) -> Dict:
    n_layers = len(cfg.depths)
    keys = iter(jax.random.split(key, n_layers * 8 + 16))
    nk = lambda: next(keys)
    d, nf = cfg.embed_dim, cfg.num_feat
    layers = []
    for li in range(n_layers):
        layers.append({
            "blocks": [_init_block(nk(), cfg, cfg.num_heads[li]) for _ in range(cfg.depths[li])],
            "conv": _init_resi_conv(nk(), cfg),
        })
    return {
        "conv_first": _conv_init(nk(), cfg.in_chans, d),
        "patch_norm": _ln_init(d),
        "layers": layers,
        "norm": _ln_init(d),
        "conv_after_body": _init_resi_conv(nk(), cfg),
        "conv_before_upsample": _conv_init(nk(), d, nf),
        "conv_up1": _conv_init(nk(), nf, nf),
        "conv_up2": _conv_init(nk(), nf, nf),
        "conv_hr": _conv_init(nk(), nf, nf),
        "conv_last": _conv_init(nk(), nf, cfg.in_chans),
    }


# ------------------------------------------------------ static tables
def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws^2, ws^2) index into the (2ws-1)^2 bias table (numpy, static)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws^2, ws^2) additive attention mask for SW-MSA (numpy)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, None, :] != win[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


# ------------------------------------------------------------ forward
def _ln(p, x):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]
    return out.astype(x.dtype)


def _linear(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _windows(x, ws):
    """(B, H, W, C) -> (B*nW, ws*ws, C)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _unwindows(x, ws, b, h, w):
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _attention(p, x, heads: int, ws: int, mask: np.ndarray | None):
    """x: (B*nW, N, C) with N = ws^2."""
    bnw, n, c = x.shape
    hd = c // heads
    qkv = _linear(p["qkv"], x).reshape(bnw, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k).astype(jnp.float32)
    bias = p["rpb"][_rel_pos_index(ws).reshape(-1)].reshape(n, n, heads)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bnw // nw, nw, heads, n, n) + jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(bnw, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(bnw, n, c)
    return _linear(p["proj"], out)


def _swin_block(p, x, heads: int, ws: int, shift: int):
    b, h, w, c = x.shape
    shortcut = x
    x = _ln(p["norm1"], x)
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    mask = _shift_mask(h, w, ws, shift) if shift else None
    x = _attention(p, _windows(x, ws), heads, ws, mask)
    x = _unwindows(x, ws, b, h, w)
    if shift:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x
    y = _ln(p["norm2"], x)
    y = _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], y), approximate=False))
    return x + y


def _resi_conv(p, x, cfg: SwinIRConfig):
    if cfg.resi_connection == "1conv":
        return conv(p["conv"], x)
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    y = lrelu(conv(p["conv0"], x))
    y = lrelu(conv(p["conv1"], y, padding=0))
    return conv(p["conv2"], y)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


def forward(params: Dict, img: jax.Array, cfg: SwinIRConfig = SWINIR_M) -> jax.Array:
    """img (B, H, W, 3) in [0, 1], H and W multiples of window_size ->
    (B, upscale*H, upscale*W, 3). The `Upscaler` wrapper mirror-pads to
    the window multiple like the reference driver (swinir.py:73-81)."""
    b, h, w, _ = img.shape
    ws = cfg.window_size
    assert h % ws == 0 and w % ws == 0, f"H,W must be multiples of {ws} (pad in caller)"
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)

    mean = jnp.asarray(_RGB_MEAN)
    x = (img.astype(jnp.float32) - mean) * cfg.img_range
    x = x.astype(dtype)
    feat = conv(params["conv_first"], x)

    # forward_features: patch_norm -> RSTB stack -> norm (all NHWC)
    y = _ln(params["patch_norm"], feat)
    for li, layer in enumerate(params["layers"]):
        y_in = y
        for bi, blk in enumerate(layer["blocks"]):
            y = _swin_block(blk, y, cfg.num_heads[li], ws, (ws // 2) if bi % 2 else 0)
        y = _resi_conv(layer["conv"], y, cfg) + y_in
    y = _ln(params["norm"], y)

    feat = _resi_conv(params["conv_after_body"], y, cfg) + feat
    feat = lrelu(conv(params["conv_before_upsample"], feat))
    feat = lrelu(conv(params["conv_up1"], _up2(feat)))
    if cfg.upscale == 4:
        feat = lrelu(conv(params["conv_up2"], _up2(feat)))
    out = conv(params["conv_last"], lrelu(conv(params["conv_hr"], feat)))
    out = out.astype(jnp.float32) / cfg.img_range + mean
    return out


# --------------------------------------------------------- conversion
def params_from_torch(sd: Dict[str, np.ndarray], cfg: SwinIRConfig = SWINIR_M) -> Dict:
    """Official SwinIR state dict -> pytree. Conv weights transpose
    OIHW->HWIO; linear weights transpose (out,in)->(in,out)."""

    def cv(name):
        return {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))),
                "b": jnp.asarray(sd[f"{name}.bias"])}

    def lin(name):
        return {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"])),
                "b": jnp.asarray(sd[f"{name}.bias"])}

    def ln(name):
        return {"g": jnp.asarray(sd[f"{name}.weight"]), "b": jnp.asarray(sd[f"{name}.bias"])}

    def resi(base):
        if cfg.resi_connection == "1conv":
            return {"conv": cv(base)}
        return {"conv0": cv(f"{base}.0"), "conv1": cv(f"{base}.2"), "conv2": cv(f"{base}.4")}

    layers = []
    for li in range(len(cfg.depths)):
        blocks = []
        for bi in range(cfg.depths[li]):
            base = f"layers.{li}.residual_group.blocks.{bi}"
            blocks.append({
                "norm1": ln(f"{base}.norm1"),
                "qkv": lin(f"{base}.attn.qkv"),
                "proj": lin(f"{base}.attn.proj"),
                "rpb": jnp.asarray(sd[f"{base}.attn.relative_position_bias_table"]),
                "norm2": ln(f"{base}.norm2"),
                "fc1": lin(f"{base}.mlp.fc1"),
                "fc2": lin(f"{base}.mlp.fc2"),
            })
        layers.append({"blocks": blocks, "conv": resi(f"layers.{li}.conv")})
    return {
        "conv_first": cv("conv_first"),
        "patch_norm": ln("patch_embed.norm"),
        "layers": layers,
        "norm": ln("norm"),
        "conv_after_body": resi("conv_after_body"),
        "conv_before_upsample": cv("conv_before_upsample.0"),
        "conv_up1": cv("conv_up1"),
        "conv_up2": cv("conv_up2"),
        "conv_hr": cv("conv_hr"),
        "conv_last": cv("conv_last"),
    }
