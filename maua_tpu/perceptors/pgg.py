"""ProGamerGov caffe perceptor zoo: caffe-VGG16/19, SOD, FCN32s,
PRUNED, NYUD, and NIN.

Rebuild of `maua/perceptors/vgg_pgg.py:13-214`: caffe-trained nets
expect BGR input scaled to [0, 255] with the caffe mean pixel
subtracted (:37-39); the pruned VGG16 uses reduced channel counts
(:54); NIN is the 11x11/5x5/3x3 conv + 1x1 cccp stack (:198-242).
Default content/style layers are the reference's Sequential indices
translated to relu indices. Converters take the neural-style-pt .pth
state dicts (`features.N.weight` naming).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import Perceptor

# caffe mean pixel (BGR), /255 domain (`vgg_pgg.py:37`)
_CAFFE_MEAN_BGR = np.array([103.939, 116.779, 123.68], np.float32) / 255.0

# channel layouts (`vgg_pgg.py:54-58`); "P" = pool
VGG16_CHANNELS = (64, 64, "P", 128, 128, "P", 256, 256, 256, "P", 512, 512, 512, "P", 512, 512, 512)
VGG16P_CHANNELS = (24, 22, "P", 41, 51, "P", 108, 89, 111, "P", 184, 276, 228, "P", 512, 512, 512)
VGG19_CHANNELS = (
    64, 64, "P", 128, 128, "P", 256, 256, 256, 256, "P", 512, 512, 512, 512, "P", 512, 512, 512, 512,
)

# reference Sequential indices -> relu indices (`vgg_pgg.py:44-52`)
DEFAULT_LAYERS = {
    "vgg16": {"content": (9,), "style": (1, 3, 6, 9, 12)},
    "vgg19": {"content": (11,), "style": (1, 3, 7, 11, 15)},
    "sod": {"content": (9,), "style": (1, 3, 6, 9, 12)},
    "fcn32s": {"content": (9,), "style": (1, 3, 6, 9, 12)},
    "nyud": {"content": (9,), "style": (1, 3, 6, 9, 12)},
    "prune": {"content": (9,), "style": (1, 3, 6, 9, 12)},
    "nin": {"content": (8,), "style": (2, 5, 8, 11)},
}

# NIN conv spec: (out_ch, kernel, stride, pad, pool_after) (`vgg_pgg.py:198-242`)
NIN_SPEC: Tuple[Tuple[int, int, int, int, bool], ...] = (
    (96, 11, 4, 0, False), (96, 1, 1, 0, False), (96, 1, 1, 0, True),
    (256, 5, 1, 2, False), (256, 1, 1, 0, False), (256, 1, 1, 0, True),
    (384, 3, 1, 1, False), (384, 1, 1, 0, False), (384, 1, 1, 0, True),
    (1024, 3, 1, 1, False), (1024, 1, 1, 0, False), (1000, 1, 1, 0, False),
)


def _channels(arch: str):
    if "19" in arch:
        return VGG19_CHANNELS
    if "prun" in arch:
        return VGG16P_CHANNELS
    return VGG16_CHANNELS


def caffe_preprocess(img: jax.Array) -> jax.Array:
    """[-1, 1] RGB -> caffe domain: [0,1], BGR, mean-subtract, x255
    (`vgg_pgg.py:37-39`)."""
    x = (img + 1.0) / 2.0
    x = x[..., ::-1]  # RGB -> BGR
    return 255.0 * (x - _CAFFE_MEAN_BGR)


def init_vgg_params(key, arch: str) -> List[Dict]:
    params = []
    ci = 3
    i = 0
    for c in _channels(arch):
        if c == "P":
            continue
        k = jax.random.fold_in(key, i)
        scale = math.sqrt(2.0 / (ci * 9)) / 255.0  # tame the x255 input domain
        params.append({"w": jax.random.normal(k, (3, 3, ci, c)) * scale, "b": jnp.zeros((c,))})
        ci = c
        i += 1
    return params


def init_nin_params(key) -> List[Dict]:
    params = []
    ci = 3
    for i, (co, ks, _, _, _) in enumerate(NIN_SPEC):
        k = jax.random.fold_in(key, i)
        scale = math.sqrt(2.0 / (ci * ks * ks)) / 255.0
        params.append({"w": jax.random.normal(k, (ks, ks, ci, co)) * scale, "b": jnp.zeros((co,))})
        ci = co
    return params


def params_from_torch(sd: Dict[str, np.ndarray]) -> List[Dict]:
    """neural-style-pt `features.N.{weight,bias}` (OIHW) -> param list
    (works for every zoo entry incl. NIN)."""
    idxs = sorted(int(k.split(".")[1]) for k in sd if k.startswith("features.") and k.endswith(".weight"))
    return [
        {
            "w": jnp.asarray(np.transpose(np.asarray(sd[f"features.{i}.weight"], np.float32), (2, 3, 1, 0))),
            "b": jnp.asarray(np.asarray(sd[f"features.{i}.bias"], np.float32)),
        }
        for i in idxs
    ]


def _pool(x, pool: str, k: int, stride: int, ceil: bool):
    if ceil:  # NIN's ceil_mode: pad so the last partial window counts
        ph = (-(x.shape[1] - k)) % stride
        pw = (-(x.shape[2] - k)) % stride
        pads = ((0, 0), (0, ph), (0, pw), (0, 0))
    else:
        pads = ((0, 0), (0, 0), (0, 0), (0, 0))
    if pool == "avg":
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1), (1, stride, stride, 1), pads)
        return s / (k * k)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), pads)


def vgg_features(params: List[Dict], img: jax.Array, arch: str, pool: str = "max") -> List[jax.Array]:
    """Caffe-domain VGG feature list (one entry per relu)."""
    x = caffe_preprocess(img)
    feats = []
    i = 0
    for c in _channels(arch):
        if c == "P":
            x = _pool(x, pool, 2, 2, ceil=False)
            continue
        p = params[i]
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"].astype(x.dtype)
        x = jax.nn.relu(x)
        feats.append(x)
        i += 1
    return feats


def nin_features(params: List[Dict], img: jax.Array, pool: str = "max") -> List[jax.Array]:
    x = caffe_preprocess(img)
    feats = []
    for p, (_, ks, stride, pad, pool_after) in zip(params, NIN_SPEC):
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (stride, stride), padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"].astype(x.dtype)
        x = jax.nn.relu(x)
        feats.append(x)
        if pool_after:
            x = _pool(x, pool, 3, 2, ceil=True)
    return feats


class PGGPerceptor(Perceptor):
    """(`maua/perceptors/vgg_pgg.py:13-41`). model_name in
    {vgg16, vgg19, sod, fcn32s, nyud, prune, nin}; checkpoints load via
    `params` (already converted) or torch-load of a .pth path."""

    def __init__(
        self,
        model_name: str = "vgg19",
        params: Optional[List[Dict]] = None,
        checkpoint: Optional[str] = None,
        content_layers: Optional[Sequence[int]] = None,
        style_layers: Optional[Sequence[int]] = None,
        pooling: str = "max",
        key=None,
    ):
        name = model_name.lower()
        base = "nin" if "nin" in name else ("prune" if "prun" in name else name)
        defaults = DEFAULT_LAYERS.get(base, DEFAULT_LAYERS["vgg16"])
        super().__init__(content_layers or defaults["content"], style_layers or defaults["style"])
        self.model_name = base
        self.pooling = pooling
        if params is None and checkpoint is not None:
            import torch

            sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
            params = params_from_torch({k: v.numpy() for k, v in sd.items()})
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = init_nin_params(key) if base == "nin" else init_vgg_params(key, base)
        self.params = params

    def get_features(self, img):
        if self.model_name == "nin":
            return nin_features(self.params, img, self.pooling)
        return vgg_features(self.params, img, self.model_name, self.pooling)
