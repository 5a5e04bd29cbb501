"""Diffusion UNet, functional JAX — one configurable implementation
covering the guided-diffusion family (self-attention, scale-shift
norm, learn_sigma) and the LDM/SD family (spatial transformers with
cross-attention, GEGLU feed-forward).

This replaces the reference's empty guided_diffusion /
stable_diffusion / latent_diffusion submodules (SURVEY.md: the actual
UNets live in stripped submodules; `maua/diffusion/processors/*`
wraps them). Attention runs through the flash kernel in
`maua_tpu.kernels.attention`.

Layout: NHWC activations, HWIO conv weights, (in, out) matrices.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


from ...kernels.attention import attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)  # downsample factors
    num_heads: int = 8
    num_head_channels: Optional[int] = None
    context_dim: Optional[int] = 768  # None = self-attention-only UNet
    transformer_depth: int = 1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    def heads_for(self, channels: int) -> int:
        if self.num_head_channels is not None:
            return max(channels // self.num_head_channels, 1)
        return self.num_heads


# SD v1.x configuration (`stable.py` model; CompVis v1-inference.yaml)
SD1_UNET = UNetConfig()
# guided-diffusion 256/512 uncond (`guided.py:171-187` model_config)
GUIDED_UNET = UNetConfig(
    in_channels=3, out_channels=6, model_channels=256, channel_mult=(1, 1, 2, 2, 4, 4),
    num_res_blocks=2, attention_resolutions=(32, 16, 8), num_head_channels=64,
    context_dim=None, use_scale_shift_norm=True, resblock_updown=True,
)


# ------------------------------------------------------------- helpers
def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _linear(key, ci, co, zero=False):
    if zero:
        return {"w": jnp.zeros((ci, co), jnp.float32), "b": jnp.zeros((co,), jnp.float32)}
    scale = 1.0 / math.sqrt(ci)
    return {
        "w": jax.random.uniform(key, (ci, co), jnp.float32, -scale, scale),
        "b": jnp.zeros((co,), jnp.float32),
    }


def _conv_init(key, k, ci, co, zero=False):
    if zero:
        return {"w": jnp.zeros((k, k, ci, co), jnp.float32), "b": jnp.zeros((co,), jnp.float32)}
    scale = 1.0 / math.sqrt(ci * k * k)
    return {
        "w": jax.random.uniform(key, (k, k, ci, co), jnp.float32, -scale, scale),
        "b": jnp.zeros((co,), jnp.float32),
    }


def _norm_init(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def linear(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def conv2d(p, x, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)


def group_norm(p, x, groups: int = 32, eps: float = 1e-5):
    c = x.shape[-1]
    g = min(groups, c)
    while c % g != 0:
        g -= 1
    xg = x.reshape(x.shape[:-1] + (g, c // g)).astype(jnp.float32)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(x.shape)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def layer_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


# ------------------------------------------------------------ resblock
def _init_resblock(key, ci, co, emb_dim, cfg: UNetConfig):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": _norm_init(ci),
        "conv1": _conv_init(ks[0], 3, ci, co),
        "emb": _linear(ks[1], emb_dim, co * 2 if cfg.use_scale_shift_norm else co),
        "norm2": _norm_init(co),
        "conv2": _conv_init(ks[2], 3, co, co, zero=True),
    }
    if ci != co:
        p["skip"] = _conv_init(ks[3], 1, ci, co)
    return p


def resblock(p, x, emb, cfg: UNetConfig, up=False, down=False):
    h = jax.nn.silu(group_norm(p["norm1"], x))
    if up:
        x = _upsample_nn(x)
        h = _upsample_nn(h)
    elif down:
        x = _avgpool(x)
        h = _avgpool(h)
    h = conv2d(p["conv1"], h)
    emb_out = linear(p["emb"], jax.nn.silu(emb))[:, None, None, :]
    if cfg.use_scale_shift_norm:
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = group_norm(p["norm2"], h) * (1 + scale) + shift
        h = jax.nn.silu(h)
    else:
        h = h + emb_out
        h = jax.nn.silu(group_norm(p["norm2"], h))
    h = conv2d(p["conv2"], h)
    skip = conv2d(p["skip"], x, padding=0) if "skip" in p else x
    return skip + h


def _upsample_nn(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


def _avgpool(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


# ----------------------------------------------------------- attention
def _init_selfattn(key, c):
    ks = jax.random.split(key, 2)
    return {
        "norm": _norm_init(c),
        "qkv": _conv_init(ks[0], 1, c, c * 3),
        "proj": _conv_init(ks[1], 1, c, c, zero=True),
    }


def self_attention_block(p, x, n_heads: int):
    """guided-diffusion AttentionBlock."""
    b, h, w, c = x.shape
    qkv = conv2d(p["qkv"], group_norm(p["norm"], x), padding=0)
    qkv = qkv.reshape(b, h * w, 3, n_heads, c // n_heads)
    q, k, v = [jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3)]  # (B, H, N, D)
    out = attention(q, k, v)
    out = jnp.moveaxis(out, 1, 2).reshape(b, h, w, c)
    return x + conv2d(p["proj"], out, padding=0)


def _init_crossattn(key, query_dim, context_dim, n_heads, head_dim):
    inner = n_heads * head_dim
    ks = jax.random.split(key, 4)
    return {
        "to_q": {"w": jax.random.normal(ks[0], (query_dim, inner)) / math.sqrt(query_dim)},
        "to_k": {"w": jax.random.normal(ks[1], (context_dim, inner)) / math.sqrt(context_dim)},
        "to_v": {"w": jax.random.normal(ks[2], (context_dim, inner)) / math.sqrt(context_dim)},
        "to_out": _linear(ks[3], inner, query_dim),
    }


def cross_attention(p, x, context, n_heads: int):
    """LDM CrossAttention. x: (B, N, C); context: (B, M, Ctx)."""
    b, n, c = x.shape
    q = x @ p["to_q"]["w"].astype(x.dtype)
    k = context @ p["to_k"]["w"].astype(x.dtype)
    v = context @ p["to_v"]["w"].astype(x.dtype)
    hd = q.shape[-1] // n_heads
    q = q.reshape(b, n, n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)
    out = attention(q, k, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
    return linear(p["to_out"], out)


def _init_transformer_block(key, c, context_dim, n_heads, head_dim):
    ks = jax.random.split(key, 6)
    return {
        "norm1": _norm_init(c),
        "attn1": _init_crossattn(ks[0], c, c, n_heads, head_dim),
        "norm2": _norm_init(c),
        "attn2": _init_crossattn(ks[1], c, context_dim, n_heads, head_dim),
        "norm3": _norm_init(c),
        "ff_in": _linear(ks[2], c, c * 8),  # GEGLU: 2 * 4c
        "ff_out": _linear(ks[3], c * 4, c),
    }


def transformer_block(p, x, context, n_heads):
    x = x + cross_attention(p["attn1"], layer_norm(p["norm1"], x), layer_norm(p["norm1"], x), n_heads)
    ctx = context if context is not None else x
    x = x + cross_attention(p["attn2"], layer_norm(p["norm2"], x), ctx, n_heads)
    h = linear(p["ff_in"], layer_norm(p["norm3"], x))
    a, gate = jnp.split(h, 2, axis=-1)
    x = x + linear(p["ff_out"], a * jax.nn.gelu(gate))
    return x


def _init_spatial_transformer(key, c, context_dim, n_heads, depth):
    head_dim = c // n_heads
    ks = jax.random.split(key, depth + 2)
    return {
        "norm": _norm_init(c),
        "proj_in": _conv_init(ks[0], 1, c, c),
        "blocks": [_init_transformer_block(ks[i + 1], c, context_dim, n_heads, head_dim) for i in range(depth)],
        # small (not zero) init — see init_params conv_out note
        "proj_out": {k: v * 0.1 for k, v in _conv_init(ks[-1], 1, c, c).items()},
    }


def spatial_transformer(p, x, context, n_heads):
    b, h, w, c = x.shape
    residual = x
    x = conv2d(p["proj_in"], group_norm(p["norm"], x), padding=0)
    x = x.reshape(b, h * w, c)
    for blk in p["blocks"]:
        x = transformer_block(blk, x, context, n_heads)
    x = x.reshape(b, h, w, c)
    return residual + conv2d(p["proj_out"], x, padding=0)


# ----------------------------------------------------------- full unet
def init_params(key, cfg: UNetConfig) -> Dict:
    mc = cfg.model_channels
    emb_dim = mc * 4
    keys = iter(jax.random.split(key, 4096))
    nk = lambda: next(keys)

    p = {
        "time_mlp1": _linear(nk(), mc, emb_dim),
        "time_mlp2": _linear(nk(), emb_dim, emb_dim),
        "conv_in": _conv_init(nk(), 3, cfg.in_channels, mc),
    }

    def attn_init(c):
        heads = cfg.heads_for(c)
        # kind is encoded in the dict key so the pytree stays all-array
        if cfg.context_dim is not None:
            return {"spatial": _init_spatial_transformer(nk(), c, cfg.context_dim, heads, cfg.transformer_depth)}
        return {"self": _init_selfattn(nk(), c)}

    downs = []
    ch = mc
    ds = 1
    input_chs = [mc]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _init_resblock(nk(), ch, mult * mc, emb_dim, cfg)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk["attn"] = attn_init(ch)
            downs.append(blk)
            input_chs.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                downs.append({"down_res": _init_resblock(nk(), ch, ch, emb_dim, cfg)})
            else:
                downs.append({"down": _conv_init(nk(), 3, ch, ch)})
            input_chs.append(ch)
            ds *= 2
    p["downs"] = downs

    p["mid"] = {
        "res1": _init_resblock(nk(), ch, ch, emb_dim, cfg),
        "attn": attn_init(ch),
        "res2": _init_resblock(nk(), ch, ch, emb_dim, cfg),
    }

    ups = []
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            skip_ch = input_chs.pop()
            blk = {"res": _init_resblock(nk(), ch + skip_ch, mult * mc, emb_dim, cfg)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk["attn"] = attn_init(ch)
            if level != 0 and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    blk["up_res"] = _init_resblock(nk(), ch, ch, emb_dim, cfg)
                else:
                    blk["up"] = _conv_init(nk(), 3, ch, ch)
                ds //= 2
            ups.append(blk)
    p["ups"] = ups

    p["norm_out"] = _norm_init(ch)
    # small (not zero) init so a random-init net is non-degenerate for
    # offline tests; pretrained checkpoints overwrite this anyway
    co = _conv_init(nk(), 3, ch, cfg.out_channels)
    p["conv_out"] = {"w": co["w"] * 0.1, "b": co["b"]}
    return p


def forward(
    params: Dict,
    x: jax.Array,  # (B, H, W, C_in)
    t: jax.Array,  # (B,) timesteps (continuous or discrete)
    cfg: UNetConfig,
    context: Optional[jax.Array] = None,  # (B, M, context_dim)
) -> jax.Array:
    dtype = cfg.compute_dtype
    x = x.astype(dtype)
    if context is not None:
        context = context.astype(dtype)

    emb = timestep_embedding(t, cfg.model_channels)
    emb = linear(params["time_mlp2"], jax.nn.silu(linear(params["time_mlp1"], emb))).astype(dtype)

    def run_attn(blk, h):
        if "spatial" in blk:
            return spatial_transformer(blk["spatial"], h, context, cfg.heads_for(h.shape[-1]))
        return self_attention_block(blk["self"], h, cfg.heads_for(h.shape[-1]))

    h = conv2d(params["conv_in"], x)
    skips = [h]
    for blk in params["downs"]:
        if "down" in blk:
            h = conv2d(blk["down"], h, stride=2)
        elif "down_res" in blk:
            h = resblock(blk["down_res"], h, emb, cfg, down=True)
        else:
            h = resblock(blk["res"], h, emb, cfg)
            if "attn" in blk:
                h = run_attn(blk["attn"], h)
        skips.append(h)

    h = resblock(params["mid"]["res1"], h, emb, cfg)
    h = run_attn(params["mid"]["attn"], h)
    h = resblock(params["mid"]["res2"], h, emb, cfg)

    for blk in params["ups"]:
        h = jnp.concatenate([h, skips.pop()], axis=-1)
        h = resblock(blk["res"], h, emb, cfg)
        if "attn" in blk:
            h = run_attn(blk["attn"], h)
        if "up" in blk:
            h = conv2d(blk["up"], _upsample_nn(h))
        elif "up_res" in blk:
            h = resblock(blk["up_res"], h, emb, cfg, up=True)

    h = jax.nn.silu(group_norm(params["norm_out"], h))
    return conv2d(params["conv_out"], h).astype(jnp.float32)
