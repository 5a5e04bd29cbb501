"""StyleGAN2 generator, pure-functional JAX.

Semantics follow the reference's self-contained inference net
(`maua/GAN/wrappers/inference/stylegan2.py`: FullyConnectedLayer
:29-58, MappingNetwork :116-192, SynthesisLayer :195-251, ToRGBLayer
:254-272, SynthesisBlock :275-382, SynthesisNetwork :385-436,
Generator :439-472) but the design is TPU-first:

* parameters are a plain pytree (nested dicts of arrays) — no modules,
  no hooks, no buffers;
* noise injection is an explicit argument (a dict of per-layer noise
  maps) instead of mutable `noise_const` buffers;
* compute dtype is a config knob (bf16 by default for synthesis at high
  resolutions, mirroring the reference's fp16 forcing in
  `wrappers/__init__.py:52-99`); demodulation always runs in f32;
* the whole forward is jittable and shard_map/pjit-friendly: batch on
  a `data` mesh axis, no data-dependent control flow.

Layouts: activations NHWC, conv weights HWIO, FC weights (in, out).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ops


@dataclasses.dataclass(frozen=True)
class SG2Config:
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 1024
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    architecture: str = "skip"  # 'orig' | 'skip' | 'resnet'
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0
    mapping_layers: int = 8
    mapping_lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998
    dtype: str = "float32"  # synthesis compute dtype ('bfloat16' for perf)

    @property
    def block_resolutions(self) -> Tuple[int, ...]:
        log2 = int(math.log2(self.img_resolution))
        return tuple(2**i for i in range(2, log2 + 1))

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2
        n += 1  # last block's torgb
        return n

    def block_num_conv(self, res: int) -> int:
        return 1 if res == 4 else 2

    def block_use_fp16(self, res: int) -> bool:
        log2 = int(math.log2(self.img_resolution))
        fp16_resolution = max(2 ** (log2 + 1 - self.num_fp16_res), 8)
        return res >= fp16_resolution

    def compute_dtype(self, res: int):
        if self.dtype == "bfloat16" and self.block_use_fp16(res):
            return jnp.bfloat16
        return jnp.float32


# ------------------------------------------------------------------ init
def _init_fc(key, in_f, out_f, lr_multiplier=1.0, bias_init=0.0):
    return {
        "w": jax.random.normal(key, (in_f, out_f), jnp.float32) / lr_multiplier,
        "b": jnp.full((out_f,), float(bias_init), jnp.float32),
    }


def fc_forward(p, x, activation="linear", lr_multiplier=1.0):
    """FullyConnectedLayer (`inference/stylegan2.py:29-58`).

    Note: for non-linear activations the reference computes
    ``F.linear(x, w.T)`` (:57) — i.e. it contracts against the
    TRANSPOSED weight relative to the linear path. Mapping layers are
    square so this runs; we reproduce it bug-for-bug since output
    parity is measured against this net. `p["w"]` is stored (in, out)
    = reference weight transposed."""
    in_f, out_f = p["w"].shape
    gain = lr_multiplier / math.sqrt(in_f)
    b = p["b"] * lr_multiplier
    if activation == "linear":
        return x @ (p["w"] * gain).astype(x.dtype) + b.astype(x.dtype)
    # the transposed contraction only type-checks for square layers;
    # non-square (e.g. conditional fc0) takes the standard path
    w = p["w"].T if in_f == out_f else p["w"]
    x = x @ (w * gain).astype(x.dtype)
    return ops.bias_act(x, b.astype(x.dtype), act=activation)


def _init_synthesis_layer(key, ci, co, w_dim, res, kernel_size=3, use_noise=True):
    ks = jax.random.split(key, 3)
    p = {
        "affine": _init_fc(ks[0], w_dim, ci, bias_init=1.0),
        "weight": jax.random.normal(ks[1], (kernel_size, kernel_size, ci, co), jnp.float32),
        "bias": jnp.zeros((co,), jnp.float32),
    }
    if use_noise:
        p["noise_const"] = jax.random.normal(ks[2], (res, res), jnp.float32)
        # the reference inference net adds noise unscaled
        # (inference/stylegan2.py:235-236); converters fold any trained
        # noise_strength into this field
        p["noise_strength"] = jnp.ones((), jnp.float32)
    return p


def _init_torgb(key, ci, co, w_dim):
    ks = jax.random.split(key, 2)
    return {
        "affine": _init_fc(ks[0], w_dim, ci, bias_init=1.0),
        "weight": jax.random.normal(ks[1], (1, 1, ci, co), jnp.float32),
        "bias": jnp.zeros((co,), jnp.float32),
    }


def init_params(key, cfg: SG2Config) -> Dict:
    """Random-initialized generator params matching the reference's
    init distributions."""
    kmap, ksyn = jax.random.split(key)

    # mapping network
    feats = [cfg.z_dim + (cfg.w_dim if cfg.c_dim > 0 else 0)] + [cfg.w_dim] * cfg.mapping_layers
    mapping = {}
    mkeys = jax.random.split(kmap, cfg.mapping_layers + 1)
    if cfg.c_dim > 0:
        mapping["embed"] = _init_fc(mkeys[-1], cfg.c_dim, cfg.w_dim)
    for i in range(cfg.mapping_layers):
        mapping[f"fc{i}"] = _init_fc(mkeys[i], feats[i], feats[i + 1], lr_multiplier=cfg.mapping_lr_multiplier)
    mapping["w_avg"] = jnp.zeros((cfg.w_dim,), jnp.float32)

    # synthesis blocks
    synthesis = {}
    for bi, res in enumerate(cfg.block_resolutions):
        bkey = jax.random.fold_in(ksyn, bi)
        ks = jax.random.split(bkey, 4)
        co = cfg.channels(res)
        block = {}
        if res == 4:
            block["const"] = jax.random.normal(ks[0], (res, res, co), jnp.float32)
            block["conv1"] = _init_synthesis_layer(ks[1], co, co, cfg.w_dim, res)
        else:
            ci = cfg.channels(res // 2)
            block["conv0"] = _init_synthesis_layer(ks[0], ci, co, cfg.w_dim, res)
            block["conv1"] = _init_synthesis_layer(ks[1], co, co, cfg.w_dim, res)
            if cfg.architecture == "resnet":
                block["skip"] = {"weight": jax.random.normal(ks[3], (1, 1, ci, co), jnp.float32)}
        if res == cfg.img_resolution or cfg.architecture == "skip":
            block["torgb"] = _init_torgb(ks[2], co, cfg.img_channels, cfg.w_dim)
        synthesis[f"b{res}"] = block
    return {"mapping": mapping, "synthesis": synthesis}


# -------------------------------------------------------------- mapping
@partial(jax.jit, static_argnames=("cfg", "truncation_cutoff"))
def mapping(
    params: Dict,
    z: jax.Array,
    cfg: SG2Config,
    c: Optional[jax.Array] = None,
    truncation_psi: float = 1.0,
    truncation_cutoff: Optional[int] = None,
) -> jax.Array:
    """z -> broadcast w's with truncation
    (`inference/stylegan2.py:161-192`). Returns (B, num_ws, w_dim)."""
    p = params["mapping"]
    x = None
    if cfg.z_dim > 0:
        x = ops.normalize_2nd_moment(z.astype(jnp.float32))
    if cfg.c_dim > 0:
        y = ops.normalize_2nd_moment(fc_forward(p["embed"], c.astype(jnp.float32)))
        x = jnp.concatenate([x, y], axis=1) if x is not None else y
    for i in range(cfg.mapping_layers):
        x = fc_forward(p[f"fc{i}"], x, activation="lrelu", lr_multiplier=cfg.mapping_lr_multiplier)
    ws = jnp.tile(x[:, None, :], (1, cfg.num_ws, 1))
    psi = jnp.asarray(truncation_psi, jnp.float32)
    w_avg = p["w_avg"]
    if truncation_cutoff is None:
        ws = w_avg + psi * (ws - w_avg)
    else:
        trunc = w_avg + psi * (ws[:, :truncation_cutoff] - w_avg)
        ws = jnp.concatenate([trunc, ws[:, truncation_cutoff:]], axis=1)
    return ws


# ------------------------------------------------------------- synthesis
def _layer_noise(
    layer_params,
    name: str,
    res: int,
    batch: int,
    noise_mode: str,
    noises: Optional[Dict],
    key,
):
    if noise_mode == "none":
        return None
    if noises is not None and name in noises:
        n = noises[name]
        if n.ndim == 2:
            n = n[None, :, :, None]
        elif n.ndim == 3:
            n = n[..., None]
        return n
    if noise_mode == "random":
        return jax.random.normal(key, (batch, res, res, 1), jnp.float32)
    return layer_params["noise_const"][None, :, :, None]


def synthesis_layer(
    p: Dict,
    x: jax.Array,
    w: jax.Array,
    res: int,
    up: int,
    rfilter: np.ndarray,
    cfg: SG2Config,
    noise: Optional[jax.Array],
    gain: float = 1.0,
) -> jax.Array:
    """SynthesisLayer forward (`inference/stylegan2.py:229-251`)."""
    styles = fc_forward(p["affine"], w.astype(jnp.float32))
    if noise is not None:
        noise = noise * p.get("noise_strength", jnp.ones(()))
    x = ops.modulated_conv2d(
        x,
        p["weight"],
        styles,
        noise=noise,
        up=up,
        padding=p["weight"].shape[0] // 2,
        resample_filter=rfilter if up > 1 else None,
        demodulate=True,
    )
    clamp = cfg.conv_clamp * gain if cfg.conv_clamp is not None else None
    return ops.bias_act(x, p["bias"], act="lrelu", gain=math.sqrt(2.0) * gain, clamp=clamp)


def torgb_layer(p: Dict, x: jax.Array, w: jax.Array, cfg: SG2Config) -> jax.Array:
    """ToRGBLayer forward (`inference/stylegan2.py:268-272`)."""
    ci = p["weight"].shape[2]
    k = p["weight"].shape[0]
    weight_gain = 1.0 / math.sqrt(ci * k * k)
    styles = fc_forward(p["affine"], w.astype(jnp.float32)) * weight_gain
    x = ops.modulated_conv2d(x, p["weight"], styles, demodulate=False)
    return ops.bias_act(x, p["bias"], clamp=cfg.conv_clamp)


def synthesis(
    params: Dict,
    ws: jax.Array,
    cfg: SG2Config,
    noise_mode: str = "const",
    noises: Optional[Dict] = None,
    noise_key: Optional[jax.Array] = None,
) -> jax.Array:
    """ws (B, num_ws, w_dim) -> image (B, H, W, C) in [-1, 1]
    (`inference/stylegan2.py:429-436`).

    `noises` maps "b{res}.conv{i}" to explicit noise maps — this is
    the functional replacement for the reference wrapper's buffer
    copying (`GAN/wrappers/stylegan2.py:85-100`).
    """
    syn = params["synthesis"]
    rfilter = ops.setup_filter(list(cfg.resample_filter))
    batch = ws.shape[0]
    if noise_key is None:
        noise_key = jax.random.PRNGKey(0)

    x = None
    img = None
    w_idx = 0
    for bi, res in enumerate(cfg.block_resolutions):
        block = syn[f"b{res}"]
        dtype = cfg.compute_dtype(res)
        num_conv = cfg.block_num_conv(res)
        block_ws = ws[:, w_idx : w_idx + num_conv + 1]

        if res == 4:
            x = jnp.tile(block["const"][None].astype(dtype), (batch, 1, 1, 1))
            n = _layer_noise(block["conv1"], f"b{res}.conv1", res, batch, noise_mode, noises,
                            jax.random.fold_in(noise_key, 2 * bi + 1))
            x = synthesis_layer(block["conv1"], x, block_ws[:, 0], res, 1, rfilter, cfg, n)
        else:
            x = x.astype(dtype)
            n0 = _layer_noise(block["conv0"], f"b{res}.conv0", res, batch, noise_mode, noises,
                             jax.random.fold_in(noise_key, 2 * bi))
            n1 = _layer_noise(block["conv1"], f"b{res}.conv1", res, batch, noise_mode, noises,
                             jax.random.fold_in(noise_key, 2 * bi + 1))
            if cfg.architecture == "resnet":
                skip_w = block["skip"]["weight"]
                skip_gain = 1.0 / math.sqrt(skip_w.shape[2])  # Conv2dLayer weight_gain, k=1
                y = ops.conv2d_resample(x, (skip_w * skip_gain).astype(dtype), f=rfilter, up=2)
                y = y * jnp.asarray(math.sqrt(0.5), dtype)
                x = synthesis_layer(block["conv0"], x, block_ws[:, 0], res, 2, rfilter, cfg, n0)
                x = synthesis_layer(block["conv1"], x, block_ws[:, 1], res, 1, rfilter, cfg, n1,
                                    gain=math.sqrt(0.5))
                x = y + x
            else:
                x = synthesis_layer(block["conv0"], x, block_ws[:, 0], res, 2, rfilter, cfg, n0)
                x = synthesis_layer(block["conv1"], x, block_ws[:, 1], res, 1, rfilter, cfg, n1)

        if img is not None:
            img = ops.upsample2d(img, rfilter)
        if res == cfg.img_resolution or cfg.architecture == "skip":
            y = torgb_layer(block["torgb"], x, block_ws[:, num_conv], cfg)
            img = (img + y.astype(img.dtype)) if img is not None else y.astype(jnp.float32)
        w_idx += num_conv
    return img.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "noise_mode", "truncation_cutoff"))
def generator(
    params: Dict,
    z: jax.Array,
    cfg: SG2Config,
    c: Optional[jax.Array] = None,
    truncation_psi: float = 1.0,
    truncation_cutoff: Optional[int] = None,
    noise_mode: str = "const",
    noises: Optional[Dict] = None,
    noise_key=None,
) -> jax.Array:
    """Full generator forward (`inference/stylegan2.py:462-472`)."""
    ws = mapping(params, z, cfg, c, truncation_psi, truncation_cutoff)
    return synthesis(params, ws, cfg, noise_mode=noise_mode, noises=noises, noise_key=noise_key)


class Generator:
    """Thin OO facade over the functional model for parity with the
    reference's `Generator` (`inference/stylegan2.py:439-472`)."""

    def __init__(self, cfg: SG2Config, params: Optional[Dict] = None, key=None):
        self.cfg = cfg
        if params is None:
            params = init_params(key if key is not None else jax.random.PRNGKey(0), cfg)
        self.params = params

    @property
    def num_ws(self) -> int:
        return self.cfg.num_ws

    def mapping(self, z, c=None, truncation_psi=1.0, truncation_cutoff=None):
        return mapping(self.params, z, self.cfg, c, truncation_psi, truncation_cutoff)

    def synthesis(self, ws, **kw):
        return synthesis(self.params, ws, self.cfg, **kw)

    def __call__(self, z, c=None, truncation_psi=1.0, truncation_cutoff=None, noise_mode="const"):
        return generator(self.params, z, self.cfg, c, truncation_psi, truncation_cutoff, noise_mode)
