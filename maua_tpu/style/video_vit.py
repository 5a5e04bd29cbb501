"""Video ViT feature extractor + gram-matched video style transfer.

Rebuild of `maua/style/omnimae.py` (in-tree video ViT-MAE
:126-1703 + the gram-style video style transfer experiment
:1705-1753) in compact functional JAX: a spatio-temporal patch ViT
(tubelet embedding, joint space-time attention) whose block features
drive gram-matrix style optimization over whole clips — style
statistics match across space AND time.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.models.unet import _linear, _norm_init, layer_norm, linear
from ..loss import gram_matrix, scaled_mse_loss, tv_loss


@dataclasses.dataclass(frozen=True)
class VideoViTConfig:
    image_size: int = 64
    patch_size: int = 8
    tubelet: int = 2  # frames per temporal patch
    width: int = 128
    layers: int = 4
    heads: int = 4


def init_params(key, cfg: VideoViTConfig) -> Dict:
    keys = iter(jax.random.split(key, 8 + cfg.layers * 8))
    nk = lambda: next(keys)
    w = cfg.width
    patch_dim = cfg.tubelet * cfg.patch_size * cfg.patch_size * 3
    n_space = (cfg.image_size // cfg.patch_size) ** 2
    p = {
        "patch_proj": _linear(nk(), patch_dim, w),
        "pos_space": jax.random.normal(nk(), (n_space, w)) * 0.02,
        "pos_time": jax.random.normal(nk(), (64, w)) * 0.02,
        "blocks": [],
    }
    for _ in range(cfg.layers):
        p["blocks"].append({
            "ln1": _norm_init(w),
            "qkv": _linear(nk(), w, 3 * w),
            "proj": _linear(nk(), w, w),
            "ln2": _norm_init(w),
            "fc1": _linear(nk(), w, 4 * w),
            "fc2": _linear(nk(), 4 * w, w),
        })
    return p


def _tubelets(video: jax.Array, cfg: VideoViTConfig) -> jax.Array:
    """(T, H, W, 3) -> (n_time, n_space, patch_dim)."""
    t, h, w, c = video.shape
    tt, ps = cfg.tubelet, cfg.patch_size
    nt = t // tt
    gh, gw = h // ps, w // ps
    v = video[: nt * tt].reshape(nt, tt, gh, ps, gw, ps, c)
    v = v.transpose(0, 2, 4, 1, 3, 5, 6)  # (nt, gh, gw, tt, ps, ps, c)
    return v.reshape(nt, gh * gw, tt * ps * ps * c)


def features(params: Dict, video: jax.Array, cfg: VideoViTConfig) -> List[jax.Array]:
    """Per-block token features (n_time, n_space, width) with joint
    space-time attention (`omnimae.py` trunk)."""
    tok = linear(params["patch_proj"], _tubelets(video, cfg))
    nt, ns, w = tok.shape
    tok = tok + params["pos_space"][None, :ns] + params["pos_time"][:nt, None]
    x = tok.reshape(1, nt * ns, w)

    feats = []
    for blk in params["blocks"]:
        h = layer_norm(blk["ln1"], x)
        qkv = linear(blk["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = w // cfg.heads
        q = q.reshape(1, -1, cfg.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(1, -1, cfg.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(1, -1, cfg.heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
        att = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1).astype(x.dtype), v)
        x = x + linear(blk["proj"], att.transpose(0, 2, 1, 3).reshape(1, -1, w))
        x = x + linear(blk["fc2"], jax.nn.gelu(linear(blk["fc1"], layer_norm(blk["ln2"], x))))
        feats.append(x.reshape(nt, ns, w))
    return feats


def video_style_transfer(
    content_video: jax.Array,  # (T, H, W, 3) in [-1, 1]
    style_video: jax.Array,  # (T', H, W, 3)
    cfg: Optional[VideoViTConfig] = None,
    n_iters: int = 100,
    lr: float = 0.05,
    content_weight: float = 1.0,
    style_weight: float = 20.0,
    tv_weight: float = 5.0,
    key=None,
    verbose: bool = True,
) -> np.ndarray:
    """Gram-matched video style transfer through the video ViT
    (`omnimae.py:1705-1753`): the whole clip is the optimization
    variable; grams pool over space-time tokens."""
    key = key if key is not None else jax.random.PRNGKey(0)
    cfg = cfg or VideoViTConfig(image_size=content_video.shape[1])
    params = init_params(key, cfg)

    content_video = jnp.asarray(content_video)
    style_video = jnp.asarray(style_video)

    content_feats = features(params, content_video, cfg)
    style_feats = features(params, style_video, cfg)
    style_grams = [gram_matrix(f.reshape(1, -1, 1, f.shape[-1]).swapaxes(1, 2)) for f in style_feats]
    content_targets = [content_feats[len(content_feats) // 2]]

    def loss_fn(video):
        v = jnp.clip(video, -1, 1)
        feats = features(params, v, cfg)
        loss = tv_weight * tv_loss(v)
        loss = loss + content_weight * jnp.mean(
            jnp.square(feats[len(feats) // 2] - content_targets[0])
        )
        for f, g in zip(feats, style_grams):
            gm = gram_matrix(f.reshape(1, -1, 1, f.shape[-1]).swapaxes(1, 2))
            loss = loss + style_weight * scaled_mse_loss(gm, g)
        return loss

    opt = optax.adam(lr)
    video = content_video
    state = opt.init(video)

    @jax.jit
    def step(video, state):
        v, g = jax.value_and_grad(loss_fn)(video)
        updates, state = opt.update(g, state, video)
        return optax.apply_updates(video, updates), state, v

    for i in range(n_iters):
        video, state, v = step(video, state)
        if verbose and i % max(n_iters // 5, 1) == 0:
            print(f"video style iter {i}/{n_iters} loss {float(v):.4f}")
    return np.asarray(jnp.clip(video, -1, 1))
