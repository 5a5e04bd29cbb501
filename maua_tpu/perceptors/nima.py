"""NIMA neural image assessment scoring.

Rebuild of `maua/perceptors/nima.py:23-57`: VGG16 feature trunk ->
flatten -> linear head to a 10-bin quality distribution (softmax);
score = sum(p_i * i), std likewise (:52-56). Input preprocessing is
torchvision imagenet normalize + resize/center-crop to 224 (:42-47).
Converter accepts the NIMA checkpoint's `features.*` VGG weights and
any `(10, 25088)` classifier linear.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import vgg as vgg_mod


def init_params(key=None, seed: int = 0) -> Dict:
    key = key if key is not None else jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)
    return {
        "vgg": vgg_mod.init_params(key, "vgg16"),
        "head": {
            "w": jnp.asarray((rng.standard_normal((512 * 7 * 7, 10)) / np.sqrt(512 * 7 * 7)).astype(np.float32)),
            "b": jnp.zeros((10,)),
        },
    }


def params_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """NIMA checkpoint (`features.*` VGG16 + a (10, 25088) linear
    classifier under any `classifier.*.weight` key) -> params."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    feats = {k[len("base_model.") :] if k.startswith("base_model.") else k: v for k, v in sd.items()}
    head_w = head_b = None
    for k, v in feats.items():
        if v.ndim == 2 and v.shape[0] == 10:
            head_w = v
            head_b = feats.get(k.replace("weight", "bias"), np.zeros(10, np.float32))
    if head_w is None:
        raise KeyError("no (10, N) classifier linear found in state dict")
    return {
        "vgg": vgg_mod.params_from_torch(feats, "vgg16"),
        "head": {"w": jnp.asarray(head_w.T), "b": jnp.asarray(head_b)},
    }


def _preprocess(img: jax.Array) -> jax.Array:
    """[0, 1] RGB (B, H, W, 3) -> imagenet-normalized 224 center crop."""
    b, h, w, c = img.shape
    s = 224 / min(h, w)
    nh, nw = int(round(h * s)), int(round(w * s))
    img = jax.image.resize(img, (b, nh, nw, c), method="bilinear")
    top, left = (nh - 224) // 2, (nw - 224) // 2
    img = img[:, top : top + 224, left : left + 224]
    return (img - vgg_mod._IMAGENET_MEAN) / vgg_mod._IMAGENET_STD


def distribution(params: Dict, img: jax.Array) -> jax.Array:
    """img (B, H, W, 3) in [0, 1] -> (B, 10) quality distribution."""
    x = _preprocess(img)
    feats = []
    i = 0
    for block, n_convs in enumerate(vgg_mod.VGG16_LAYOUT):
        for _ in range(n_convs):
            p = params["vgg"][i]
            x = jax.lax.conv_general_dilated(
                x, p["w"].astype(x.dtype), (1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["b"].astype(x.dtype)
            x = jax.nn.relu(x)
            i += 1
        # torchvision VGG pools after EVERY block (incl. the last:
        # 224 -> 7x7 feature map feeding the 25088-d head)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    # torch flatten order is CHW; transpose to match the converted head
    flat = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
    return jax.nn.softmax(flat @ params["head"]["w"] + params["head"]["b"], axis=-1)


def nima_score(img, params: Optional[Dict] = None) -> Tuple[jax.Array, jax.Array]:
    """(`maua/perceptors/nima.py:33-57`) img in [0, 1] -> (score, std),
    score = E[i], std = mean over batch of sqrt(E[(i - mean)^2])."""
    params = params if params is not None else init_params()
    probs = distribution(params, jnp.asarray(img))
    idxs = jnp.arange(10, dtype=jnp.float32)
    means = jnp.sum(probs * idxs, axis=-1)
    stds = jnp.sqrt(jnp.sum(probs * (idxs[None] - means[:, None]) ** 2, axis=-1))
    return jnp.mean(means), jnp.mean(stds)
