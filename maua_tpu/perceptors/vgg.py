"""VGG feature extractor, functional JAX.

Rebuild of the reference's VGG perceptors (`maua/perceptors/
vgg_kbc.py:11-68` crowsonkb VGG19, `vgg_pgg.py:13-214` caffe model
zoo): a configurable VGG16/19 conv stack with features captured after
every relu. Weights convert from torchvision-style flat state dicts;
random init keeps the pipeline runnable offline.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import Perceptor

VGG16_LAYOUT = (2, 2, 3, 3, 3)
VGG19_LAYOUT = (2, 2, 4, 4, 4)
CHANNELS = (64, 128, 256, 512, 512)

# canonical style/content layer indices (relu indices, kbc convention)
DEFAULT_CONTENT = (8,)
DEFAULT_STYLE = (1, 3, 6, 10, 14)  # vgg19 (16 relus)
DEFAULT_STYLE_16 = (1, 3, 6, 9, 12)  # vgg16 (13 relus)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _layout(arch: str):
    return VGG19_LAYOUT if "19" in arch else VGG16_LAYOUT


def init_params(key, arch: str = "vgg19") -> List[Dict]:
    params = []
    ci = 3
    i = 0
    for block, n_convs in enumerate(_layout(arch)):
        co = CHANNELS[block]
        for _ in range(n_convs):
            k = jax.random.fold_in(key, i)
            scale = math.sqrt(2.0 / (ci * 9))
            params.append(
                {"w": jax.random.normal(k, (3, 3, ci, co)) * scale, "b": jnp.zeros((co,))}
            )
            ci = co
            i += 1
    return params


def params_from_torch(sd: Dict[str, np.ndarray], arch: str = "vgg19") -> List[Dict]:
    """torchvision `features.{idx}.weight` state dict -> param list."""
    convs = sorted(
        (int(k.split(".")[1]) for k in sd if k.startswith("features.") and k.endswith(".weight")),
    )
    params = []
    for idx in convs:
        w = sd[f"features.{idx}.weight"]
        params.append({
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "b": jnp.asarray(sd[f"features.{idx}.bias"]),
        })
    return params


def features(params: List[Dict], img: jax.Array, arch: str = "vgg19", pool: str = "max") -> List[jax.Array]:
    """img (B, H, W, 3) in [-1, 1] -> per-relu feature list."""
    x = (img + 1.0) / 2.0
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    feats = []
    i = 0
    for block, n_convs in enumerate(_layout(arch)):
        for _ in range(n_convs):
            p = params[i]
            x = jax.lax.conv_general_dilated(
                x, p["w"].astype(x.dtype), (1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["b"].astype(x.dtype)
            x = jax.nn.relu(x)
            feats.append(x)
            i += 1
        if block < len(_layout(arch)) - 1:
            # pooling choice + activation-scale correction
            # (`maua/perceptors/vgg_kbc.py:14-15,41-45`): non-max pooling
            # changes the activation scale, so rescale by {avg: 2.0, l2: 0.78}
            if pool == "avg":
                x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
                x = x * 2.0
            elif pool == "l2":
                x = jnp.sqrt(jax.lax.reduce_window(jnp.square(x), 0.0, jax.lax.add,
                                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID"))
                x = x * 0.78
            else:
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats


class VGGPerceptor(Perceptor):
    """(`maua/perceptors/vgg_kbc.py:11-68`)"""

    def __init__(
        self,
        arch: str = "vgg19",
        params: Optional[List[Dict]] = None,
        content_layers: Optional[Sequence[int]] = None,
        style_layers: Optional[Sequence[int]] = None,
        pool: str = "max",
        pooling: Optional[str] = None,  # reference kwarg name (vgg_kbc.py:23)
        content_strength: float = 1.0,
        style_strength: float = 1.0,
        key=None,
    ):
        if style_layers is None:
            style_layers = DEFAULT_STYLE if "19" in arch else DEFAULT_STYLE_16
        if content_layers is None:
            content_layers = DEFAULT_CONTENT
        super().__init__(content_layers, style_layers, content_strength, style_strength)
        self.arch = arch
        self.pool = pooling if pooling is not None else pool
        if self.pool not in ("max", "avg", "l2"):
            raise ValueError(f"unknown pooling {self.pool!r} (one of max/avg/l2)")
        self.params = params if params is not None else init_params(key or jax.random.PRNGKey(0), arch)

    def get_features(self, img):
        return features(self.params, img, self.arch, self.pool)
