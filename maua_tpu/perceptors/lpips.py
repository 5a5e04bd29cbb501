"""LPIPS perceptual distance with learned linear calibration.

Rebuild of the reference's `lpips.LPIPS(net="vgg")` used by
`maua/grad.py:179-196` LPIPSGrads: VGG16 features at relu1_2 / relu2_2
/ relu3_3 / relu4_3 / relu5_3, channel-unit-normalized, squared
difference, 1x1 learned non-negative "lin" weights, spatial mean,
summed over stages. `params_from_torch` takes the lpips package's lin
checkpoint (`lin{k}.model.1.weight`) plus a torchvision VGG16 state
dict; random init keeps the path runnable offline (weights are then
uncalibrated but the distance is still a valid perceptual metric).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import vgg as vgg_mod

# VGG16 relu indices of the five LPIPS stages (relu{1_2,2_2,3_3,4_3,5_3})
LPIPS_STAGES = (1, 3, 6, 9, 12)
STAGE_CHANNELS = (64, 128, 256, 512, 512)

# lpips ScalingLayer constants (maps [-1,1] input to the net domain)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_params(key=None, seed: int = 0) -> Dict:
    key = key if key is not None else jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)
    return {
        "vgg": vgg_mod.init_params(key, "vgg16"),
        "lins": [jnp.asarray(np.abs(rng.standard_normal(c)).astype(np.float32) / c) for c in STAGE_CHANNELS],
    }


def params_from_torch(lin_sd: Dict[str, np.ndarray], vgg_sd: Dict[str, np.ndarray]) -> Dict:
    """lpips lin checkpoint (`lin{k}.model.1.weight` (1, C, 1, 1)) +
    torchvision vgg16 `features.*` state dict -> params."""
    lins = []
    for k in range(5):
        for name in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if name in lin_sd:
                lins.append(jnp.asarray(np.asarray(lin_sd[name], np.float32).reshape(-1)))
                break
        else:
            raise KeyError(f"missing lin weights for stage {k}")
    return {"vgg": vgg_mod.params_from_torch(vgg_sd, "vgg16"), "lins": lins}


def _normalize(feat: jax.Array, eps: float = 1e-10) -> jax.Array:
    return feat / jnp.sqrt(jnp.sum(feat**2, axis=-1, keepdims=True) + eps)


def _stage_features(params: Dict, img: jax.Array) -> List[jax.Array]:
    """img (B, H, W, 3) in [-1, 1] -> LPIPS stage features.

    Replicates the lpips preprocessing exactly: ScalingLayer on [-1,1]
    input (NOT the torchvision mean/std path in vgg_mod.features)."""
    x = (img - _SHIFT) / _SCALE
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
            if i in LPIPS_STAGES:
                feats.append(x)
            i += 1
        if block < len(vgg_mod.VGG16_LAYOUT) - 1:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats


def lpips(params: Dict, img0: jax.Array, img1: jax.Array) -> jax.Array:
    """Perceptual distance per batch element, imgs (B, H, W, 3) in
    [-1, 1] -> (B,)."""
    f0 = _stage_features(params, img0)
    f1 = _stage_features(params, img1)
    total = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        d = (_normalize(a) - _normalize(b)) ** 2
        total = total + jnp.mean(jnp.sum(d * jax.nn.relu(lin), axis=-1), axis=(1, 2))
    return total


class LPIPSPerceptor:
    def __init__(self, params: Optional[Dict] = None, key=None):
        self.params = params if params is not None else init_params(key)

    def __call__(self, img0, img1):
        return lpips(self.params, img0, img1)
