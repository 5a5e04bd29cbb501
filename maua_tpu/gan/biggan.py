"""BigGAN generator with instance conditioning (the IC-GAN backbone).

Rebuild of the net behind `maua/GAN/icgan/generate.py:90` (`load_icgan`
loads an ic_gan BigGAN; the architecture itself lives in the stripped
`submodules/ic_gan` = BigGAN-PyTorch): hierarchical z (per-block z
chunks concatenated onto the conditioning vector), class-conditional
BatchNorm (`ccbn`: stored-stat BN scaled by 1 + gain(y) and shifted by
bias(y)), G blocks (bn-relu-upsample-conv x2 + upsampled 1x1 skip),
SA-GAN self-attention at one resolution, and a tanh output head.

Instance conditioning (IC-GAN): the conditioning vector is an embedded
instance feature (SwAV ResNet-50 2048-d — `gan/extractors.py` provides
exactly this tower) in place of / alongside the class embedding.

Spectral norm is folded at conversion: BigGAN-PyTorch stores the raw
`weight` with power-iteration buffers `u0`/`sv0`; the effective
inference weight is `weight / sigma` with sigma taken from `sv0` (or
re-estimated by power iteration when absent).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BigGANConfig:
    resolution: int = 256
    ch: int = 96
    dim_z: int = 120
    shared_dim: int = 128
    n_classes: int = 0  # 0 = unconditional-class (pure instance cond)
    instance_cond: bool = True
    feature_dim: int = 2048  # SwAV ResNet-50 features
    attention_res: int = 64
    bn_eps: float = 1e-4

    @property
    def arch(self):
        """(in_mult, out_mult) per block, 4x4 -> resolution."""
        mults = {
            32: ([4, 4, 4], [4, 4, 4]),
            64: ([16, 16, 8, 4], [16, 8, 4, 2]),
            128: ([16, 16, 8, 4, 2], [16, 8, 4, 2, 1]),
            256: ([16, 16, 8, 8, 4, 2], [16, 8, 8, 4, 2, 1]),
        }
        return mults[self.resolution]

    @property
    def num_blocks(self) -> int:
        return len(self.arch[0])

    @property
    def z_chunk(self) -> int:
        return self.dim_z // (self.num_blocks + 1)

    @property
    def cond_dim(self) -> int:
        base = self.shared_dim if (self.n_classes > 0 or self.instance_cond) else 0
        return base + self.z_chunk


def _linear(key, ci, co, bias=True):
    p = {"w": jax.random.normal(key, (ci, co)) / math.sqrt(ci)}
    if bias:
        p["b"] = jnp.zeros((co,))
    return p


def _conv(key, k, ci, co, bias=True):
    p = {"w": jax.random.normal(key, (k, k, ci, co)) * math.sqrt(2.0 / (ci * k * k))}
    if bias:
        p["b"] = jnp.zeros((co,))
    return p


def _ccbn(key, ch, cond_dim):
    k1, k2 = jax.random.split(key)
    return {
        "gain": _linear(k1, cond_dim, ch, bias=False),
        "bias": _linear(k2, cond_dim, ch, bias=False),
        "mean": jnp.zeros((ch,)),
        "var": jnp.ones((ch,)),
    }


def init_params(key, cfg: BigGANConfig) -> Dict:
    keys = iter(jax.random.split(key, 16 + cfg.num_blocks * 8))
    nk = lambda: next(keys)
    in_m, out_m = cfg.arch
    ch0 = in_m[0] * cfg.ch
    p: Dict = {"linear": _linear(nk(), cfg.z_chunk, 4 * 4 * ch0)}
    if cfg.n_classes > 0:
        p["shared"] = jax.random.normal(nk(), (cfg.n_classes, cfg.shared_dim)) * 0.02
    if cfg.instance_cond:
        p["embed_features"] = _linear(nk(), cfg.feature_dim, cfg.shared_dim, bias=False)
    blocks: List[Dict] = []
    for i in range(cfg.num_blocks):
        ci, co = in_m[i] * cfg.ch, out_m[i] * cfg.ch
        blocks.append({
            "bn1": _ccbn(nk(), ci, cfg.cond_dim),
            "conv1": _conv(nk(), 3, ci, co),
            "bn2": _ccbn(nk(), co, cfg.cond_dim),
            "conv2": _conv(nk(), 3, co, co),
            "conv_sc": _conv(nk(), 1, ci, co),
        })
    p["blocks"] = blocks
    attn_ch = out_m[int(math.log2(cfg.attention_res)) - 3] * cfg.ch
    p["attention"] = {
        "theta": _conv(nk(), 1, attn_ch, attn_ch // 8, bias=False),
        "phi": _conv(nk(), 1, attn_ch, attn_ch // 8, bias=False),
        "g": _conv(nk(), 1, attn_ch, attn_ch // 2, bias=False),
        "o": _conv(nk(), 1, attn_ch // 2, attn_ch, bias=False),
        "gamma": jnp.zeros(()),
    }
    p["output"] = {
        "bn": {"scale": jnp.ones((out_m[-1] * cfg.ch,)), "bias": jnp.zeros((out_m[-1] * cfg.ch,)),
               "mean": jnp.zeros((out_m[-1] * cfg.ch,)), "var": jnp.ones((out_m[-1] * cfg.ch,))},
        "conv": _conv(nk(), 3, out_m[-1] * cfg.ch, 3),
    }
    return p


# ----------------------------------------------------------- forward
def _apply_conv(p, x, stride=1, padding=None):
    k = p["w"].shape[0]
    pad = k // 2 if padding is None else padding
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + p["b"] if "b" in p else out


def _apply_ccbn(p, x, y, eps):
    gain = 1.0 + y @ p["gain"]["w"]
    bias = y @ p["bias"]["w"]
    xn = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
    return xn * gain[:, None, None, :] + bias[:, None, None, :]


def _upsample(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")


def _attention(p, x):
    """SA-GAN attention (BigGAN-PyTorch Attention)."""
    b, h, w, c = x.shape
    theta = _apply_conv(p["theta"], x).reshape(b, h * w, c // 8)
    phi = jax.lax.reduce_window(_apply_conv(p["phi"], x), -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    g = jax.lax.reduce_window(_apply_conv(p["g"], x), -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    phi = phi.reshape(b, h * w // 4, c // 8)
    g = g.reshape(b, h * w // 4, c // 2)
    beta = jax.nn.softmax(jnp.einsum("bic,bjc->bij", theta, phi), axis=-1)
    o = jnp.einsum("bij,bjc->bic", beta, g).reshape(b, h, w, c // 2)
    return x + p["gamma"] * _apply_conv(p["o"], o)


def generator(
    params: Dict,
    z: jax.Array,  # (B, dim_z)
    cfg: BigGANConfig,
    labels: Optional[jax.Array] = None,  # (B,) int class ids
    features: Optional[jax.Array] = None,  # (B, feature_dim) instance features
) -> jax.Array:
    """z (+ labels / instance features) -> (B, R, R, 3) in [-1, 1]."""
    n = cfg.num_blocks
    zs = jnp.split(z[:, : cfg.z_chunk * (n + 1)], n + 1, axis=1)
    cond = []
    if cfg.instance_cond and features is not None:
        cond.append(features @ params["embed_features"]["w"])
    if cfg.n_classes > 0 and labels is not None:
        cond.append(params["shared"][labels])
    base = sum(cond) if cond else None

    h = (zs[0] @ params["linear"]["w"] + params["linear"]["b"]).reshape(z.shape[0], 4, 4, -1)
    res = 4
    for i, blk in enumerate(params["blocks"]):
        y = zs[i + 1] if base is None else jnp.concatenate([base, zs[i + 1]], axis=1)
        x = jax.nn.relu(_apply_ccbn(blk["bn1"], h, y, cfg.bn_eps))
        x = _upsample(x)
        x = _apply_conv(blk["conv1"], x)
        x = jax.nn.relu(_apply_ccbn(blk["bn2"], x, y, cfg.bn_eps))
        x = _apply_conv(blk["conv2"], x)
        h = x + _apply_conv(blk["conv_sc"], _upsample(h))
        res *= 2
        if res == cfg.attention_res:
            h = _attention(params["attention"], h)
    ob = params["output"]["bn"]
    h = (h - ob["mean"]) * jax.lax.rsqrt(ob["var"] + cfg.bn_eps) * ob["scale"] + ob["bias"]
    return jnp.tanh(_apply_conv(params["output"]["conv"], jax.nn.relu(h)))


# ---------------------------------------------------------- converter
def _sn_fold(sd, prefix: str) -> np.ndarray:
    """Fold spectral norm: weight / sigma with sigma from the stored
    `sv0` buffer, or re-estimated by power iteration."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    if f"{prefix}.sv0" in sd:
        sigma = float(np.asarray(sd[f"{prefix}.sv0"]).reshape(-1)[0])
    else:
        mat = w.reshape(w.shape[0], -1)
        u = np.asarray(sd.get(f"{prefix}.u0", np.random.default_rng(0).standard_normal((1, mat.shape[0])))).reshape(-1)
        for _ in range(5):
            v = mat.T @ u
            v /= np.linalg.norm(v) + 1e-12
            u = mat @ v
            u /= np.linalg.norm(u) + 1e-12
        sigma = float(u @ mat @ v)
    return w / max(sigma, 1e-12)


def _conv_from(sd, prefix) -> Dict:
    w = _sn_fold(sd, prefix)  # torch OIHW
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))
    return p


def _linear_from(sd, prefix) -> Dict:
    w = _sn_fold(sd, prefix)  # (out, in)
    p = {"w": jnp.asarray(w.T)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))
    return p


def params_from_torch(sd, cfg: BigGANConfig) -> Dict:
    """BigGAN-PyTorch / ic_gan generator state dict -> params. Blocks
    are `blocks.{i}.0` GBlocks (with the attention as `blocks.{j}.1`);
    ccbn stats are `stored_mean`/`stored_var`."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def ccbn_from(prefix):
        return {
            "gain": {"w": jnp.asarray(_sn_fold(sd, f"{prefix}.gain").T)},
            "bias": {"w": jnp.asarray(_sn_fold(sd, f"{prefix}.bias").T)},
            "mean": jnp.asarray(np.asarray(sd[f"{prefix}.stored_mean"], np.float32)),
            "var": jnp.asarray(np.asarray(sd[f"{prefix}.stored_var"], np.float32)),
        }

    p: Dict = {"linear": _linear_from(sd, "linear")}
    if any(k.startswith("shared.") for k in sd):
        p["shared"] = jnp.asarray(np.asarray(sd["shared.weight"], np.float32))
    for cand in ("embed_features", "feature_embed", "shared_features"):
        if f"{cand}.weight" in sd:
            p["embed_features"] = {"w": jnp.asarray(_sn_fold(sd, cand).T)}
            break
    blocks = []
    attn = None
    i = 0
    while f"blocks.{i}.0.conv1.weight" in sd:
        pre = f"blocks.{i}.0"
        blocks.append({
            "bn1": ccbn_from(f"{pre}.bn1"),
            "conv1": _conv_from(sd, f"{pre}.conv1"),
            "bn2": ccbn_from(f"{pre}.bn2"),
            "conv2": _conv_from(sd, f"{pre}.conv2"),
            "conv_sc": _conv_from(sd, f"{pre}.conv_sc"),
        })
        if f"blocks.{i}.1.theta.weight" in sd:
            apre = f"blocks.{i}.1"
            attn = {
                "theta": _conv_from(sd, f"{apre}.theta"),
                "phi": _conv_from(sd, f"{apre}.phi"),
                "g": _conv_from(sd, f"{apre}.g"),
                "o": _conv_from(sd, f"{apre}.o"),
                "gamma": jnp.asarray(np.asarray(sd[f"{apre}.gamma"], np.float32).reshape(())),
            }
        i += 1
    p["blocks"] = blocks
    if attn is not None:
        p["attention"] = attn
    p["output"] = {
        "bn": {
            "scale": jnp.asarray(np.asarray(sd["output_layer.0.gain"], np.float32).reshape(-1))
            if "output_layer.0.gain" in sd
            else jnp.asarray(np.asarray(sd.get("output_layer.0.weight", np.ones(1)), np.float32).reshape(-1)),
            "bias": jnp.asarray(np.asarray(sd.get("output_layer.0.bias", np.zeros(1)), np.float32).reshape(-1)),
            "mean": jnp.asarray(np.asarray(sd["output_layer.0.stored_mean"], np.float32)),
            "var": jnp.asarray(np.asarray(sd["output_layer.0.stored_var"], np.float32)),
        },
        "conv": _conv_from(sd, "output_layer.2"),
    }
    return p
