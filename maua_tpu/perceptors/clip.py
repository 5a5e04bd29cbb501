"""CLIP perceptor: ViT image tower + text tower, joint embedding.

Rebuild of `maua/perceptors/clip.py` (and the aesthetic head
`perceptors/aesthetic.py:8-22`). The text tower reuses
`maua_tpu.text.clip_text`; the image tower is a standard CLIP ViT.
Weights convert from OpenAI/open_clip state dicts; random init keeps
offline tests runnable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.models.unet import _linear, _norm_init, layer_norm, linear
from ..text import clip_text
from . import Perceptor

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512


def init_vision_params(key, cfg: CLIPVisionConfig) -> Dict:
    keys = iter(jax.random.split(key, 16 + cfg.layers * 8))
    nk = lambda: next(keys)
    w = cfg.width
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    p = {
        "patch_embed": jax.random.normal(nk(), (cfg.patch_size, cfg.patch_size, 3, w)) * 0.02,
        "class_embedding": jax.random.normal(nk(), (w,)) * 0.02,
        "positional_embedding": jax.random.normal(nk(), (n_patches + 1, w)) * 0.01,
        "ln_pre": _norm_init(w),
        "ln_post": _norm_init(w),
        "proj": jax.random.normal(nk(), (w, cfg.embed_dim)) / math.sqrt(w),
        "blocks": [],
    }
    for _ in range(cfg.layers):
        p["blocks"].append(
            {
                "ln1": _norm_init(w),
                "q": _linear(nk(), w, w),
                "k": _linear(nk(), w, w),
                "v": _linear(nk(), w, w),
                "out": _linear(nk(), w, w),
                "ln2": _norm_init(w),
                "fc1": _linear(nk(), w, w * 4),
                "fc2": _linear(nk(), w * 4, w),
            }
        )
    return p


def _mha(blk, x, heads):
    n, l, w = x.shape
    hd = w // heads
    q = linear(blk["q"], x).reshape(n, l, heads, hd).transpose(0, 2, 1, 3)
    k = linear(blk["k"], x).reshape(n, l, heads, hd).transpose(0, 2, 1, 3)
    v = linear(blk["v"], x).reshape(n, l, heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    att = jnp.einsum("nhqk,nhkd->nhqd", probs, v).transpose(0, 2, 1, 3).reshape(n, l, w)
    return linear(blk["out"], att)


def encode_image(params: Dict, img: jax.Array, cfg: CLIPVisionConfig) -> jax.Array:
    """img (B, S, S, 3) in [-1, 1] -> normalized embeddings
    (B, embed_dim)."""
    x = (img + 1.0) / 2.0
    x = (x - _CLIP_MEAN) / _CLIP_STD
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"].astype(x.dtype), (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, gh, gw, w = x.shape
    x = x.reshape(b, gh * gw, w)
    cls = jnp.tile(params["class_embedding"][None, None, :], (b, 1, 1)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"][: x.shape[1]].astype(x.dtype)
    x = layer_norm(params["ln_pre"], x)
    for blk in params["blocks"]:
        x = x + _mha(blk, layer_norm(blk["ln1"], x), cfg.heads)
        x = x + linear(blk["fc2"], jax.nn.gelu(linear(blk["fc1"], layer_norm(blk["ln2"], x)), approximate=True))
    x = layer_norm(params["ln_post"], x[:, 0])
    emb = x @ params["proj"].astype(x.dtype)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


class CLIPPerceptor(Perceptor):
    """Dual-tower CLIP with normalized joint embeddings
    (`maua/perceptors/clip.py`)."""

    def __init__(
        self,
        vision_params: Optional[Dict] = None,
        vision_cfg: CLIPVisionConfig = CLIPVisionConfig(),
        text_params: Optional[Dict] = None,
        text_cfg: Optional[clip_text.CLIPTextConfig] = None,
        text_proj: Optional[jax.Array] = None,
        key=None,
    ):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        self.vision_cfg = vision_cfg
        self.text_cfg = text_cfg or clip_text.CLIPTextConfig(width=512, layers=6, heads=8)
        self.vision_params = vision_params if vision_params is not None else init_vision_params(k1, vision_cfg)
        self.text_params = text_params if text_params is not None else clip_text.init_params(k2, self.text_cfg)
        if text_proj is None:
            text_proj = jax.random.normal(k3, (self.text_cfg.width, vision_cfg.embed_dim)) / math.sqrt(self.text_cfg.width)
        self.text_proj = text_proj
        self.image_size = vision_cfg.image_size

    def encode_image(self, img) -> jax.Array:
        if img.shape[1] != self.image_size:
            img = jax.image.resize(img, (img.shape[0], self.image_size, self.image_size, img.shape[3]), "bilinear")
        return encode_image(self.vision_params, img, self.vision_cfg)

    def encode_text(self, texts) -> jax.Array:
        tokens = jnp.asarray(clip_text.tokenize(texts, self.text_cfg.context_length))
        hidden = clip_text.encode_text(self.text_params, tokens, self.text_cfg)
        # pooled: hidden state at the EOT token (argmax of token ids)
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = hidden[jnp.arange(hidden.shape[0]), eot_idx]
        emb = pooled @ self.text_proj
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def get_features(self, img) -> List[jax.Array]:
        return [self.encode_image(img)]


class AestheticPerceptor(CLIPPerceptor):
    """Linear aesthetic score head on CLIP embeddings
    (`maua/perceptors/aesthetic.py:8-22`)."""

    def __init__(self, head: Optional[Dict] = None, **kw):
        super().__init__(**kw)
        if head is None:
            k = jax.random.PRNGKey(42)
            head = {"w": jax.random.normal(k, (self.vision_cfg.embed_dim, 1)) * 0.02, "b": jnp.zeros((1,))}
        self.head = head

    def score(self, img) -> jax.Array:
        return (self.encode_image(img) @ self.head["w"] + self.head["b"]).squeeze(-1)


class NIMAPerceptor(CLIPPerceptor):
    """Neural image assessment: 10-bucket quality distribution head on
    image embeddings (`maua/perceptors/nima.py:23-34`)."""

    def __init__(self, head=None, **kw):
        super().__init__(**kw)
        if head is None:
            k = jax.random.PRNGKey(7)
            head = {
                "w": jax.random.normal(k, (self.vision_cfg.embed_dim, 10)) * 0.02,
                "b": jnp.zeros((10,)),
            }
        self.head = head

    def distribution(self, img) -> jax.Array:
        logits = self.encode_image(img) @ self.head["w"] + self.head["b"]
        return jax.nn.softmax(logits, axis=-1)

    def score(self, img) -> jax.Array:
        """Mean opinion score in [1, 10]."""
        probs = self.distribution(img)
        return probs @ (jnp.arange(10, dtype=jnp.float32) + 1.0)
