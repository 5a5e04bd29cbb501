"""SpyNet optical flow (pyramidal residual flow network).

Completes the reference's declared estimator ensemble
(`maua/flow/__init__.py:9-64`; sniklaus adapter `maua/flow/sniklaus.py:
21-38` — the actual net lives in a stripped submodule). TPU-native
formulation: one jitted coarse-to-fine pass where every pyramid level
runs the same 5-conv "basic" unit (7x7 convs, NHWC/HWIO) on
[im1, warp(im2, flow), flow] and adds the predicted residual.

Weights convert from the published sniklaus `pytorch-spynet` state
dicts (`netBasic.{L}.netBasic.{2k}.*` naming and the
`basic_module.{L}.basic_module.{2k}.*` mm-style variant) via
`params_from_torch`.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

N_LEVELS = 6
# per-level basic unit: channels 8 -> 32 -> 64 -> 32 -> 16 -> 2, all 7x7
_CHANNELS = [8, 32, 64, 32, 16, 2]

# ImageNet normalization (sniklaus preprocessing)
_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def init_params(key, n_levels: int = N_LEVELS) -> List[Dict]:
    levels = []
    for _ in range(n_levels):
        unit = []
        for ci, co in zip(_CHANNELS[:-1], _CHANNELS[1:]):
            key, sub = jax.random.split(key)
            unit.append({
                "w": jax.random.normal(sub, (7, 7, ci, co)) * (1.0 / np.sqrt(49 * ci)),
                "b": jnp.zeros((co,)),
            })
        levels.append({"convs": unit})
    return levels


def params_from_torch(sd: Dict[str, np.ndarray], n_levels: int = N_LEVELS) -> List[Dict]:
    """Convert a sniklaus pytorch-spynet state dict (OIHW) to the
    NHWC/HWIO pytree. Accepts `netBasic.{L}.netBasic.{idx}` (original),
    `basic_module.{L}.basic_module.{idx}` (mm-style), and plain
    `{L}.{idx}` prefixes; convs sit at sequential indices 0,2,4,6,8."""
    def find(level, idx, leaf):
        for fmt in (
            f"netBasic.{level}.netBasic.{idx}.{leaf}",
            f"basic_module.{level}.basic_module.{idx}.{leaf}",
            f"moduleBasic.{level}.moduleBasic.{idx}.{leaf}",
            f"{level}.{idx}.{leaf}",
        ):
            if fmt in sd:
                return np.asarray(sd[fmt], np.float32)
        raise KeyError(f"spynet level {level} conv {idx} {leaf} not found")

    levels = []
    for lvl in range(n_levels):
        unit = []
        for k in range(5):
            w = find(lvl, 2 * k, "weight")  # (co, ci, 7, 7)
            b = find(lvl, 2 * k, "bias")
            unit.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)})
        levels.append({"convs": unit})
    return levels


def _basic_unit(unit: Dict, x):
    for i, conv in enumerate(unit["convs"]):
        x = jax.lax.conv_general_dilated(
            x, conv["w"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + conv["b"]
        if i < len(unit["convs"]) - 1:
            x = jax.nn.relu(x)
    return x


def _warp(img, flow):
    """img (B,H,W,C), flow (B,H,W,2) in pixels -> backward-warped img."""
    from ..ops.warp import grid_sample, identity_grid

    B, H, W, _ = img.shape
    grid = identity_grid(B, H, W)
    norm = jnp.asarray([2.0 / W, 2.0 / H])
    return grid_sample(img, grid + flow * norm, padding_mode="border")


def spynet_forward(params: List[Dict], im1, im2):
    """(B,H,W,3) normalized image pairs (H, W multiples of 2^levels)
    -> (B,H,W,2) pixel flow; jittable."""
    n = len(params)
    pyr1, pyr2 = [im1], [im2]
    for _ in range(n - 1):
        pool = lambda x: jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) * 0.25
        pyr1.append(pool(pyr1[-1]))
        pyr2.append(pool(pyr2[-1]))

    B = im1.shape[0]
    h, w = pyr1[-1].shape[1:3]
    flow = jnp.zeros((B, h, w, 2), jnp.float32)
    for lvl in range(n - 1, -1, -1):
        p1, p2 = pyr1[lvl], pyr2[lvl]
        if flow.shape[1:3] != p1.shape[1:3]:
            flow = jax.image.resize(flow, (B, p1.shape[1], p1.shape[2], 2), "bilinear") * 2.0
        inp = jnp.concatenate([p1, _warp(p2, flow), flow], axis=-1)
        # params follow the torch checkpoint ordering: module 0 runs at the
        # COARSEST level (upstream inserts pooled levels at list head, then
        # applies netBasic[intLevel] walking coarse->fine). Our pyramid has
        # index 0 = finest, so the unit for pyramid level `lvl` is
        # params[n-1-lvl].
        flow = flow + _basic_unit(params[n - 1 - lvl], inp)
    return flow


def spynet_flow(frame1, frame2, params: List[Dict] = None) -> np.ndarray:
    """(H,W,3) [0,1] frame pair -> (H,W,2) numpy pixel flow. Resizes to
    the nearest 32-multiple for the pyramid and rescales the flow back
    (the standard SpyNet inference recipe)."""
    if params is None:
        params = init_params(jax.random.PRNGKey(0))
    f1 = jnp.asarray(frame1, jnp.float32)[None]
    f2 = jnp.asarray(frame2, jnp.float32)[None]
    H, W = f1.shape[1:3]
    mult = 2 ** (len(params) - 1)
    Hp = max(int(np.ceil(H / mult)) * mult, mult)
    Wp = max(int(np.ceil(W / mult)) * mult, mult)
    norm = lambda x: (x - _MEAN) / _STD
    f1 = jax.image.resize(norm(f1), (1, Hp, Wp, 3), "bilinear")
    f2 = jax.image.resize(norm(f2), (1, Hp, Wp, 3), "bilinear")
    flow = spynet_forward(params, f1, f2)
    if (Hp, Wp) != (H, W):
        flow = jax.image.resize(flow, (1, H, W, 2), "bilinear")
        flow = flow * jnp.asarray([W / Wp, H / Hp])
    return np.asarray(flow[0])
