"""Secondary v-objective diffusion UNet (Crowson's
SecondaryDiffusionImageNet2), functional JAX.

Rebuild of the reference's in-tree model
(`maua/diffusion/processors/guided.py:38-141`): a 6-scale conv UNet
with skip-concats, Fourier time features, and v-prediction outputs
(v, pred, eps). Used as the cheap x0-predictor for gradient guidance
('fast' speed mode, guided.py:253-256).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CS = (64, 128, 128, 256, 256, 512)


def t_to_alpha_sigma(t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(`guided.py:28-29`)"""
    return jnp.cos(t * jnp.pi / 2), jnp.sin(t * jnp.pi / 2)


def _conv_names() -> List[Tuple[str, int, int]]:
    """(name, c_in, c_out) for every conv in forward order, matching
    the reference's nested Sequential structure."""
    names = []
    names.append(("net.0.0", 3 + 16, CS[0]))
    names.append(("net.1.0", CS[0], CS[0]))
    prefix = "net.2"
    for lvl in range(1, 5):
        names.append((f"{prefix}.main.1.0", CS[lvl - 1], CS[lvl]))
        names.append((f"{prefix}.main.2.0", CS[lvl], CS[lvl]))
        prefix = f"{prefix}.main.3"
    # innermost level 5
    names.append((f"{prefix}.main.1.0", CS[4], CS[5]))
    names.append((f"{prefix}.main.2.0", CS[5], CS[5]))
    names.append((f"{prefix}.main.3.0", CS[5], CS[5]))
    names.append((f"{prefix}.main.4.0", CS[5], CS[4]))
    # unwind levels 4..1
    for lvl in range(4, 0, -1):
        prefix = prefix.rsplit(".main.3", 1)[0]
        names.append((f"{prefix}.main.4.0", CS[lvl] * 2, CS[lvl]))
        names.append((f"{prefix}.main.5.0", CS[lvl], CS[lvl - 1]))
    names.append(("net.3.0", CS[0] * 2, CS[0]))
    names.append(("net.4", CS[0], 3))
    return names


def init_params(key) -> Dict:
    params = {"timestep_embed": jax.random.normal(key, (8, 1), jnp.float32)}
    convs = {}
    for i, (name, ci, co) in enumerate(_conv_names()):
        k = jax.random.fold_in(key, i + 1)
        scale = 1.0 / math.sqrt(ci * 9)
        convs[name] = {
            "w": jax.random.uniform(k, (3, 3, ci, co), jnp.float32, -scale, scale),
            "b": jnp.zeros((co,), jnp.float32),
        }
    params["convs"] = convs
    return params


def params_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """torch state dict (OIHW) -> pytree (HWIO)."""
    convs = {}
    for name, ci, co in _conv_names():
        w = sd[f"{name}.weight"]
        convs[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "b": jnp.asarray(sd[f"{name}.bias"]),
        }
    return {"timestep_embed": jnp.asarray(sd["timestep_embed.weight"]), "convs": convs}


def _conv(p, x, relu=True):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _down(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def _up(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")


def forward(params: Dict, x: jax.Array, t: jax.Array):
    """x: (B, H, W, 3) in [-1,1]; t: (B,) in [0, 1].
    Returns dict(v, pred, eps) (`guided.py:133-140`)."""
    convs = params["convs"]
    f = 2 * jnp.pi * t[:, None] @ params["timestep_embed"].T  # (B, 8)
    te = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)  # (B, 16)
    te = jnp.tile(te[:, None, None, :], (1, x.shape[1], x.shape[2], 1))

    h = jnp.concatenate([x, te.astype(x.dtype)], axis=-1)
    h = _conv(convs["net.0.0"], h)
    h = _conv(convs["net.1.0"], h)

    prefix = "net.2"
    skips = [h]
    for lvl in range(1, 5):
        h = _down(h)
        h = _conv(convs[f"{prefix}.main.1.0"], h)
        h = _conv(convs[f"{prefix}.main.2.0"], h)
        skips.append(h)
        prefix = f"{prefix}.main.3"

    inner_skip = h
    h = _down(h)
    h = _conv(convs[f"{prefix}.main.1.0"], h)
    h = _conv(convs[f"{prefix}.main.2.0"], h)
    h = _conv(convs[f"{prefix}.main.3.0"], h)
    h = _conv(convs[f"{prefix}.main.4.0"], h)
    h = _up(h)
    h = jnp.concatenate([h, inner_skip], axis=-1)

    for lvl in range(4, 0, -1):
        prefix = prefix.rsplit(".main.3", 1)[0]
        h = _conv(convs[f"{prefix}.main.4.0"], h)
        h = _conv(convs[f"{prefix}.main.5.0"], h)
        h = _up(h)
        h = jnp.concatenate([h, skips[lvl - 1]], axis=-1)

    h = _conv(convs["net.3.0"], h)
    v = _conv(convs["net.4"], h, relu=False)

    alphas, sigmas = t_to_alpha_sigma(t)
    a = alphas.reshape(-1, 1, 1, 1)
    s = sigmas.reshape(-1, 1, 1, 1)
    pred = x * a - v * s
    eps = x * s + v * a
    return {"v": v, "pred": pred, "eps": eps}
