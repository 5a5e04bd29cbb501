"""Real metric feature extractors: FID InceptionV3 and SwAV ResNet-50.

Functional JAX rebuilds of the reference extractors
(`maua/GAN/metrics/extractors/inception.py:26-35` — TorchScript FID
InceptionV3 producing 2048-d pool3 features from [-1, 1] 299x299 input —
and `maua/GAN/metrics/extractors/swav.py:142-354` — the in-tree SwAV
ResNet-50 whose metric features are the 2048-d backbone avgpool).

TPU-first design decisions:
- NHWC layout throughout; every conv is `lax.conv_general_dilated` with
  HWIO weights so XLA tiles them straight onto the MXU.
- BatchNorm is inference-only here, so it is FOLDED into the preceding
  conv at conversion time (w' = w * g/sqrt(v+eps), b' = b0 - g*m/sqrt(v+eps)
  with b0 = 0 for the bias-free convs both nets use). The runtime graph
  is pure conv+bias+relu — nothing for XLA to fuse badly.
- Weights come from torch state dicts via `*_params_from_torch`; with no
  checkpoint available, `random_state_dict_*` builds a correctly-shaped
  random torch-style state dict so random-init runs share the exact
  conversion + forward code path that converted checkpoints use.

Both extractors emit 2048-d features consumed unchanged by
`gan/metrics.py` (fid / kernel_distance / prdc).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Dict[str, jax.Array]]


# --------------------------------------------------------------- helpers
def _fold_bn(w: np.ndarray, gamma, beta, mean, var, eps: float) -> Tuple[np.ndarray, np.ndarray]:
    """Fold an eval-mode BatchNorm into the preceding bias-free conv.
    w is torch OIHW; returns (HWIO w', bias')."""
    scale = gamma / np.sqrt(var + eps)
    w = w * scale[:, None, None, None]  # scale output channels
    b = beta - mean * scale
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32), b.astype(np.float32)


def _conv_bn_from_sd(sd, conv_key: str, bn_key: str, eps: float) -> Dict[str, jax.Array]:
    w, b = _fold_bn(
        np.asarray(sd[f"{conv_key}.weight"], np.float32),
        np.asarray(sd[f"{bn_key}.weight"], np.float32),
        np.asarray(sd[f"{bn_key}.bias"], np.float32),
        np.asarray(sd[f"{bn_key}.running_mean"], np.float32),
        np.asarray(sd[f"{bn_key}.running_var"], np.float32),
        eps,
    )
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def _conv(p: Dict[str, jax.Array], x: jax.Array, stride: int = 1, padding="SAME_LOWER") -> jax.Array:
    """NHWC conv + bias. `padding` is an int, (ph, pw) tuple, or explicit."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    return (
        jax.lax.conv_general_dilated(
            x, p["w"], (stride, stride), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + p["b"]
    )


def _crelu(p, x, stride=1, padding=0):
    return jax.nn.relu(_conv(p, x, stride, padding))


def _max_pool(x: jax.Array, k: int, stride: int, pad: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avg_pool(x: jax.Array, k: int, stride: int, pad: int, count_include_pad: bool = True) -> jax.Array:
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    if count_include_pad:
        return summed / (k * k)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return summed / counts


# ------------------------------------------------- random torch state dicts
def _rand_sd_conv_bn(rng, sd, conv_key, bn_key, co, ci, kh, kw):
    # gamma < 1 keeps deep residual stacks at O(1) activations like a
    # trained checkpoint, so float32 parity checks aren't swamped by
    # cancellation noise at O(1e4) scale
    sd[f"{conv_key}.weight"] = (rng.standard_normal((co, ci, kh, kw)) * math.sqrt(2.0 / (ci * kh * kw))).astype(
        np.float32
    )
    sd[f"{bn_key}.weight"] = rng.uniform(0.2, 0.5, co).astype(np.float32)
    sd[f"{bn_key}.bias"] = (rng.standard_normal(co) * 0.05).astype(np.float32)
    sd[f"{bn_key}.running_mean"] = (rng.standard_normal(co) * 0.1).astype(np.float32)
    sd[f"{bn_key}.running_var"] = rng.uniform(0.8, 1.2, co).astype(np.float32)


# ======================================================================
# FID InceptionV3 (pytorch-fid / torchvision arch with the FID pooling
# tweaks: count_include_pad=False avg pools; Mixed_7c branch_pool is max)
# ======================================================================
_BN_EPS_INCEPTION = 1e-3

# (name, out_ch, in_ch, (kh, kw)) for every conv+bn unit, in torch naming.
def _inception_units() -> List[Tuple[str, int, int, Tuple[int, int]]]:
    units: List[Tuple[str, int, int, Tuple[int, int]]] = [
        ("Conv2d_1a_3x3", 32, 3, (3, 3)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3)),
        ("Conv2d_2b_3x3", 64, 32, (3, 3)),
        ("Conv2d_3b_1x1", 80, 64, (1, 1)),
        ("Conv2d_4a_3x3", 192, 80, (3, 3)),
    ]

    def a(block, ci, pool_features):
        units.extend([
            (f"{block}.branch1x1", 64, ci, (1, 1)),
            (f"{block}.branch5x5_1", 48, ci, (1, 1)),
            (f"{block}.branch5x5_2", 64, 48, (5, 5)),
            (f"{block}.branch3x3dbl_1", 64, ci, (1, 1)),
            (f"{block}.branch3x3dbl_2", 96, 64, (3, 3)),
            (f"{block}.branch3x3dbl_3", 96, 96, (3, 3)),
            (f"{block}.branch_pool", pool_features, ci, (1, 1)),
        ])

    a("Mixed_5b", 192, 32)
    a("Mixed_5c", 256, 64)
    a("Mixed_5d", 288, 64)
    units.extend([
        ("Mixed_6a.branch3x3", 384, 288, (3, 3)),
        ("Mixed_6a.branch3x3dbl_1", 64, 288, (1, 1)),
        ("Mixed_6a.branch3x3dbl_2", 96, 64, (3, 3)),
        ("Mixed_6a.branch3x3dbl_3", 96, 96, (3, 3)),
    ])

    def c(block, c7):
        units.extend([
            (f"{block}.branch1x1", 192, 768, (1, 1)),
            (f"{block}.branch7x7_1", c7, 768, (1, 1)),
            (f"{block}.branch7x7_2", c7, c7, (1, 7)),
            (f"{block}.branch7x7_3", 192, c7, (7, 1)),
            (f"{block}.branch7x7dbl_1", c7, 768, (1, 1)),
            (f"{block}.branch7x7dbl_2", c7, c7, (7, 1)),
            (f"{block}.branch7x7dbl_3", c7, c7, (1, 7)),
            (f"{block}.branch7x7dbl_4", c7, c7, (7, 1)),
            (f"{block}.branch7x7dbl_5", 192, c7, (1, 7)),
            (f"{block}.branch_pool", 192, 768, (1, 1)),
        ])

    c("Mixed_6b", 128)
    c("Mixed_6c", 160)
    c("Mixed_6d", 160)
    c("Mixed_6e", 192)
    units.extend([
        ("Mixed_7a.branch3x3_1", 192, 768, (1, 1)),
        ("Mixed_7a.branch3x3_2", 320, 192, (3, 3)),
        ("Mixed_7a.branch7x7x3_1", 192, 768, (1, 1)),
        ("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7)),
        ("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1)),
        ("Mixed_7a.branch7x7x3_4", 192, 192, (3, 3)),
    ])

    def e(block, ci):
        units.extend([
            (f"{block}.branch1x1", 320, ci, (1, 1)),
            (f"{block}.branch3x3_1", 384, ci, (1, 1)),
            (f"{block}.branch3x3_2a", 384, 384, (1, 3)),
            (f"{block}.branch3x3_2b", 384, 384, (3, 1)),
            (f"{block}.branch3x3dbl_1", 448, ci, (1, 1)),
            (f"{block}.branch3x3dbl_2", 384, 448, (3, 3)),
            (f"{block}.branch3x3dbl_3a", 384, 384, (1, 3)),
            (f"{block}.branch3x3dbl_3b", 384, 384, (3, 1)),
            (f"{block}.branch_pool", 192, ci, (1, 1)),
        ])

    e("Mixed_7b", 1280)
    e("Mixed_7c", 2048)
    return units


def inception_params_from_torch(sd) -> Params:
    """Convert a pytorch-fid / torchvision `inception_v3` state dict
    (keys `<unit>.conv.weight`, `<unit>.bn.{weight,bias,running_*}`)."""
    return {
        name: _conv_bn_from_sd(sd, f"{name}.conv", f"{name}.bn", _BN_EPS_INCEPTION)
        for name, _, _, _ in _inception_units()
    }


def random_state_dict_inception(seed: int = 0):
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for name, co, ci, (kh, kw) in _inception_units():
        _rand_sd_conv_bn(rng, sd, f"{name}.conv", f"{name}.bn", co, ci, kh, kw)
    return sd


def _inception_a(p: Params, b: str, x: jax.Array) -> jax.Array:
    b1 = _crelu(p[f"{b}.branch1x1"], x)
    b5 = _crelu(p[f"{b}.branch5x5_2"], _crelu(p[f"{b}.branch5x5_1"], x), padding=2)
    b3 = _crelu(p[f"{b}.branch3x3dbl_1"], x)
    b3 = _crelu(p[f"{b}.branch3x3dbl_2"], b3, padding=1)
    b3 = _crelu(p[f"{b}.branch3x3dbl_3"], b3, padding=1)
    bp = _crelu(p[f"{b}.branch_pool"], _avg_pool(x, 3, 1, 1, count_include_pad=False))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p: Params, b: str, x: jax.Array) -> jax.Array:
    b3 = _crelu(p[f"{b}.branch3x3"], x, stride=2)
    bd = _crelu(p[f"{b}.branch3x3dbl_1"], x)
    bd = _crelu(p[f"{b}.branch3x3dbl_2"], bd, padding=1)
    bd = _crelu(p[f"{b}.branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x, 3, 2, 0)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p: Params, b: str, x: jax.Array) -> jax.Array:
    b1 = _crelu(p[f"{b}.branch1x1"], x)
    b7 = _crelu(p[f"{b}.branch7x7_1"], x)
    b7 = _crelu(p[f"{b}.branch7x7_2"], b7, padding=(0, 3))
    b7 = _crelu(p[f"{b}.branch7x7_3"], b7, padding=(3, 0))
    bd = _crelu(p[f"{b}.branch7x7dbl_1"], x)
    bd = _crelu(p[f"{b}.branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _crelu(p[f"{b}.branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _crelu(p[f"{b}.branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _crelu(p[f"{b}.branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _crelu(p[f"{b}.branch_pool"], _avg_pool(x, 3, 1, 1, count_include_pad=False))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p: Params, b: str, x: jax.Array) -> jax.Array:
    b3 = _crelu(p[f"{b}.branch3x3_2"], _crelu(p[f"{b}.branch3x3_1"], x), stride=2)
    b7 = _crelu(p[f"{b}.branch7x7x3_1"], x)
    b7 = _crelu(p[f"{b}.branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _crelu(p[f"{b}.branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _crelu(p[f"{b}.branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x, 3, 2, 0)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p: Params, b: str, x: jax.Array, pool: str) -> jax.Array:
    b1 = _crelu(p[f"{b}.branch1x1"], x)
    b3 = _crelu(p[f"{b}.branch3x3_1"], x)
    b3 = jnp.concatenate(
        [_crelu(p[f"{b}.branch3x3_2a"], b3, padding=(0, 1)), _crelu(p[f"{b}.branch3x3_2b"], b3, padding=(1, 0))],
        axis=-1,
    )
    bd = _crelu(p[f"{b}.branch3x3dbl_1"], x)
    bd = _crelu(p[f"{b}.branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate(
        [_crelu(p[f"{b}.branch3x3dbl_3a"], bd, padding=(0, 1)), _crelu(p[f"{b}.branch3x3dbl_3b"], bd, padding=(1, 0))],
        axis=-1,
    )
    if pool == "max":  # FIDInceptionE_2: max pool in the pool branch
        pooled = _max_pool(x, 3, 1, 1)
    else:  # FIDInceptionE_1: count-exclude-pad avg pool
        pooled = _avg_pool(x, 3, 1, 1, count_include_pad=False)
    bp = _crelu(p[f"{b}.branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_forward(params: Params, x: jax.Array) -> jax.Array:
    """x: (B, 299, 299, 3) in [-1, 1] -> (B, 2048) pool3 features."""
    x = _crelu(params["Conv2d_1a_3x3"], x, stride=2)
    x = _crelu(params["Conv2d_2a_3x3"], x)
    x = _crelu(params["Conv2d_2b_3x3"], x, padding=1)
    x = _max_pool(x, 3, 2, 0)
    x = _crelu(params["Conv2d_3b_1x1"], x)
    x = _crelu(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x, 3, 2, 0)
    for b in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params, b, x)
    x = _inception_b(params, "Mixed_6a", x)
    for b in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params, b, x)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, pool="avg")
    x = _inception_e(params, "Mixed_7c", x, pool="max")
    return jnp.mean(x, axis=(1, 2))


# ======================================================================
# SwAV ResNet-50 backbone (Bottleneck [3, 4, 6, 3])
# ======================================================================
_BN_EPS_RESNET = 1e-5
_R50_LAYERS = (3, 4, 6, 3)


def _resnet_units() -> List[Tuple[str, str, int, int, Tuple[int, int]]]:
    """(conv_key, bn_key, out_ch, in_ch, (kh, kw)) for ResNet-50."""
    units = [("conv1", "bn1", 64, 3, (7, 7))]
    ci = 64
    for stage, n_blocks in enumerate(_R50_LAYERS):
        planes = 64 * 2**stage
        for i in range(n_blocks):
            pre = f"layer{stage + 1}.{i}"
            units.append((f"{pre}.conv1", f"{pre}.bn1", planes, ci, (1, 1)))
            units.append((f"{pre}.conv2", f"{pre}.bn2", planes, planes, (3, 3)))
            units.append((f"{pre}.conv3", f"{pre}.bn3", planes * 4, planes, (1, 1)))
            if i == 0:
                units.append((f"{pre}.downsample.0", f"{pre}.downsample.1", planes * 4, ci, (1, 1)))
            ci = planes * 4
    return units


def swav_params_from_torch(sd) -> Params:
    """Convert a SwAV / torchvision ResNet-50 state dict (the reference
    strips the `module.` DDP prefix, `swav.py:349-353`); projection-head
    and prototype keys are ignored — metric features are the backbone's."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return {ck: _conv_bn_from_sd(sd, ck, bk, _BN_EPS_RESNET) for ck, bk, _, _, _ in _resnet_units()}


def random_state_dict_swav(seed: int = 0):
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for ck, bk, co, ci, (kh, kw) in _resnet_units():
        _rand_sd_conv_bn(rng, sd, ck, bk, co, ci, kh, kw)
    return sd


def swav_forward(params: Params, x: jax.Array) -> jax.Array:
    """x: (B, 224, 224, 3) -> (B, 2048) backbone avgpool features.

    Matches `swav.py forward_backbone`: ConstantPad2d(1) + 7x7/s2/p2
    conv (net padding 3, identical to torchvision's p3)."""
    x = _crelu(params["conv1"], x, stride=2, padding=3)
    x = _max_pool(x, 3, 2, 1)
    for stage, n_blocks in enumerate(_R50_LAYERS):
        for i in range(n_blocks):
            pre = f"layer{stage + 1}.{i}"
            stride = 2 if (i == 0 and stage > 0) else 1
            y = _crelu(params[f"{pre}.conv1"], x)
            y = _crelu(params[f"{pre}.conv2"], y, stride=stride, padding=1)
            y = _conv(params[f"{pre}.conv3"], y)
            if i == 0:
                identity = _conv(params[f"{pre}.downsample.0"], x, stride=stride)
            else:
                identity = x
            x = jax.nn.relu(y + identity)
    return jnp.mean(x, axis=(1, 2))


# ======================================================================
# Extractor objects for gan/metrics.compute_metrics
# ======================================================================
class _Extractor:
    def __init__(self, params: Params, forward, size: int):
        self.params = params
        self.size = size
        self.feat_dim = 2048
        self._fwd = jax.jit(forward)

    def __call__(self, img: jax.Array) -> jax.Array:
        """img (B, H, W, 3) in [-1, 1] -> (B, 2048)."""
        from .metrics import clean_resize

        return self._fwd(self.params, clean_resize(img, self.size))


def load_inception(checkpoint: str | None = None, seed: int = 0) -> _Extractor:
    """FID InceptionV3 at 299px (`extractors/__init__.py:6-9`). With no
    checkpoint (zero-egress env) a random-init state dict keeps the
    conversion + forward path exercised; numbers are then NOT comparable
    to the literature and callers are warned."""
    if checkpoint is not None:
        import torch

        sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        sd = {k: np.asarray(v.float().numpy()) for k, v in sd.items() if hasattr(v, "numpy")}
    else:
        print("warning: no Inception checkpoint — random-init features, FID/KID not comparable")
        sd = random_state_dict_inception(seed)
    return _Extractor(inception_params_from_torch(sd), inception_forward, 299)


def load_swav(checkpoint: str | None = None, seed: int = 0) -> _Extractor:
    """SwAV ResNet-50 at 224px (`extractors/__init__.py:2-5`)."""
    if checkpoint is not None:
        import torch

        sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        sd = {k: np.asarray(v.float().numpy()) for k, v in sd.items() if hasattr(v, "numpy")}
    else:
        print("warning: no SwAV checkpoint — random-init features, FID/KID not comparable")
        sd = random_state_dict_swav(seed)
    return _Extractor(swav_params_from_torch(sd), swav_forward, 224)


def get_extractor(name: str, checkpoint: str | None = None):
    """(`metrics/extractors/__init__.py:1-11`)"""
    name = name.lower()
    if name == "swav":
        return load_swav(checkpoint)
    if name == "inception":
        return load_inception(checkpoint)
    raise ValueError(f"Unknown extractor {name}")
