"""LiteFlowNet optical flow (cascaded matching / subpixel / regularization).

Completes the reference's declared estimator ensemble
(`maua/flow/__init__.py:9-64`; sniklaus adapter `maua/flow/sniklaus.py:
61-74` — the actual net lives in a stripped submodule). TPU-native
formulation of the published `pytorch-liteflownet` architecture:

- 6-level shared feature pyramid (NetC);
- per level (6 coarse -> 2 fine) three cascaded units (NetE):
  * Matching: 7x7-window cost volume (49 static shifted products,
    channel mean, leaky-relu) on flow-warped features -> conv stack ->
    flow residual; at the two finest levels the volume is computed on
    a stride-2 spatial lattice and lifted back by a grouped 4x4/2
    transposed conv (the reference's `netUpcorr`);
  * Subpixel: [feat1, warp(feat2, flow), flow] -> conv stack -> flow
    residual;
  * Regularization: feature-driven local filtering — a conv stack on
    [warp brightness error, mean-centred flow, features] predicts
    per-pixel negative-square-distance logits over a kxk window, the
    softmax of which locally re-averages the flow field (the
    reference's unfold + netDist + netScaleX/Y);
- learned grouped 4x4/2 transposed convs upsample flow between levels.

All unfold/correlation windows are static shifted slices so XLA fuses
them; transposed convs run as lhs-dilated convs (the TPU-native
formulation). Weights convert from the published sniklaus
`network-default.pytorch` state dict via `params_from_torch`
(ModuleList index i holds level i+2: index 0 is the FINEST level —
the level-order footgun the SpyNet converter test pins down).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")

LEVELS = (2, 3, 4, 5, 6)  # decoder levels, run coarse (6) -> fine (2)

# per-level constants (sniklaus tables, indexed by level number)
_FLOW_SCALE = {2: 10.0, 3: 5.0, 4: 2.5, 5: 1.25, 6: 0.625}
_FLOW_KERNEL = {2: 7, 3: 5, 4: 5, 5: 3, 6: 3}  # final flow-conv size
_UNFOLD = {2: 7, 3: 5, 4: 5, 5: 3, 6: 3}  # regularization window
_FEAT_CH = {1: 32, 2: 32, 3: 64, 4: 96, 5: 128, 6: 192}
_CORR_RADIUS = 3  # 7x7 window -> 49 channels

# BGR means subtracted inside the network (caffe-trained checkpoints);
# first and second frame use slightly different statistics upstream
_MEAN_ONE = np.asarray([0.411618, 0.434631, 0.454253], np.float32)
_MEAN_TWO = np.asarray([0.410782, 0.433645, 0.452793], np.float32)


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def _conv(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME", dimension_numbers=_DN
    ) + p["b"]


def _deconv_grouped(x, w):
    """4x4 stride-2 pad-1 grouped (1ch/group) transposed conv, no bias.
    `w` is HWIO (4,4,1,C) already spatially flipped by the converter."""
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=_DN, feature_group_count=C,
    )


def _shifts(x, radius: int):
    """(B,H,W,C) -> list of (2r+1)^2 shifted views (zero pad), row-major
    (dy outer, dx inner) — the unfold / correlation channel order."""
    B, H, W, C = x.shape
    pad = jnp.pad(x, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    return [
        jax.lax.dynamic_slice(pad, (0, dy, dx, 0), (B, H, W, C))
        for dy in range(2 * radius + 1)
        for dx in range(2 * radius + 1)
    ]


def _correlation(f1, f2, stride: int = 1):
    """Channel-mean cost volume over a 7x7 displacement window,
    leaky-relu'd. stride=2 evaluates on a half-resolution spatial
    lattice (the reference's intStride=2 at the two finest levels)."""
    if stride > 1:
        f1 = f1[:, ::stride, ::stride]
    B, H, W, C = f1.shape
    r = _CORR_RADIUS
    pad = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    outs = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            s = jax.lax.slice(
                pad, (0, dy, dx, 0),
                (B, dy + stride * (H - 1) + 1, dx + stride * (W - 1) + 1, C),
                (1, stride, stride, 1))
            outs.append(jnp.mean(f1 * s, axis=-1))
    return _lrelu(jnp.stack(outs, axis=-1))


def _warp(img, flow):
    from ..ops.warp import grid_sample, identity_grid

    B, H, W, _ = img.shape
    grid = identity_grid(B, H, W)
    norm = jnp.asarray([2.0 / W, 2.0 / H])
    return grid_sample(img, grid + flow * norm, padding_mode="zeros")


# --------------------------------------------------------------------- params

def _conv_spec(kh, kw, ci, co):
    return (kh, kw, ci, co)


def _feature_specs():
    return {
        "one": [_conv_spec(7, 7, 3, 32)],
        "two": [_conv_spec(3, 3, 32, 32), _conv_spec(3, 3, 32, 32), _conv_spec(3, 3, 32, 32)],
        "thr": [_conv_spec(3, 3, 32, 64), _conv_spec(3, 3, 64, 64)],
        "fou": [_conv_spec(3, 3, 64, 96), _conv_spec(3, 3, 96, 96)],
        "fiv": [_conv_spec(3, 3, 96, 128)],
        "six": [_conv_spec(3, 3, 128, 192)],
    }


def _matching_specs(lvl: int):
    k = _FLOW_KERNEL[lvl]
    return {
        "feat": [_conv_spec(1, 1, 32, 64)] if lvl == 2 else [],
        "main": [_conv_spec(3, 3, 49, 128), _conv_spec(3, 3, 128, 64),
                 _conv_spec(3, 3, 64, 32), _conv_spec(k, k, 32, 2)],
        "upflow": lvl != 6,
        "upcorr": lvl < 4,
    }


def _subpixel_specs(lvl: int):
    k = _FLOW_KERNEL[lvl]
    c = (64 if lvl == 2 else _FEAT_CH[lvl]) * 2 + 2
    return {
        "feat": [_conv_spec(1, 1, 32, 64)] if lvl == 2 else [],
        "main": [_conv_spec(3, 3, c, 128), _conv_spec(3, 3, 128, 64),
                 _conv_spec(3, 3, 64, 32), _conv_spec(k, k, 32, 2)],
    }


def _regularization_specs(lvl: int):
    u = _UNFOLD[lvl]
    cm = 1 + 2 + (128 if lvl < 5 else _FEAT_CH[lvl])
    spec = {
        "feat": [_conv_spec(1, 1, _FEAT_CH[lvl], 128)] if lvl < 5 else [],
        "main": [_conv_spec(3, 3, cm, 128), _conv_spec(3, 3, 128, 128),
                 _conv_spec(3, 3, 128, 64), _conv_spec(3, 3, 64, 64),
                 _conv_spec(3, 3, 64, 32), _conv_spec(3, 3, 32, 32)],
        "scale_x": [_conv_spec(1, 1, u * u, 1)],
        "scale_y": [_conv_spec(1, 1, u * u, 1)],
    }
    if lvl >= 5:
        spec["dist"] = [_conv_spec(3, 3, 32, u * u)]
    else:  # separable kx1 then 1xk (the reference's two-conv netDist)
        spec["dist"] = [_conv_spec(u, 1, 32, u * u), _conv_spec(1, u, u * u, u * u)]
    return spec


def init_params(key) -> Dict:
    """Random-init parameter pytree with the exact converter layout."""
    def conv(spec):
        nonlocal key
        kh, kw, ci, co = spec
        key, sub = jax.random.split(key)
        return {"w": jax.random.normal(sub, (kh, kw, ci, co)) * (1.0 / np.sqrt(kh * kw * ci)),
                "b": jnp.zeros((co,))}

    def convs(specs):
        return [conv(s) for s in specs]

    params: Dict = {"features": {k: convs(v) for k, v in _feature_specs().items()}}
    for lvl in LEVELS:
        ms, ss, rs = _matching_specs(lvl), _subpixel_specs(lvl), _regularization_specs(lvl)
        m = {"feat": convs(ms["feat"]), "main": convs(ms["main"])}
        if ms["upflow"]:
            key, sub = jax.random.split(key)
            m["upflow"] = jax.random.normal(sub, (4, 4, 1, 2)) * 0.25
        if ms["upcorr"]:
            key, sub = jax.random.split(key)
            m["upcorr"] = jax.random.normal(sub, (4, 4, 1, 49)) * 0.25
        params[f"matching{lvl}"] = m
        params[f"subpixel{lvl}"] = {"feat": convs(ss["feat"]), "main": convs(ss["main"])}
        params[f"regularization{lvl}"] = {k: convs(rs[k]) for k in
                                          ("feat", "main", "dist", "scale_x", "scale_y")}
    return params


def params_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """Convert a sniklaus pytorch-liteflownet state dict to the
    NHWC/HWIO pytree. ModuleList index i holds level i+2 (index 0 =
    finest level 2); sequential conv indices skip the LeakyReLU slots
    (0, 2, 4, ...). Transposed convs ((in, out/groups, kh, kw), here
    grouped with 1 channel per group) flip spatially into HWIO."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def conv(prefix, idx):
        w = sd[f"{prefix}.{idx}.weight"]  # (co, ci, kh, kw)
        b = sd[f"{prefix}.{idx}.bias"]
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}

    def seq(prefix, n):
        return [conv(prefix, 2 * i) for i in range(n)]

    def grouped_deconv(key):
        w = sd[key]  # (C, 1, 4, 4) — groups=C, 1 out channel per group
        return jnp.asarray(w[:, 0, ::-1, ::-1].transpose(1, 2, 0)[..., None, :])

    params: Dict = {"features": {
        name: seq(f"netFeatures.net{name.capitalize()}", len(specs))
        for name, specs in _feature_specs().items()
    }}
    for i, lvl in enumerate(LEVELS):
        ms = _matching_specs(lvl)
        m = {"feat": seq(f"netMatching.{i}.netFeat", len(ms["feat"])),
             "main": seq(f"netMatching.{i}.netMain", len(ms["main"]))}
        if ms["upflow"]:
            m["upflow"] = grouped_deconv(f"netMatching.{i}.netUpflow.weight")
        if ms["upcorr"]:
            m["upcorr"] = grouped_deconv(f"netMatching.{i}.netUpcorr.weight")
        params[f"matching{lvl}"] = m
        ss = _subpixel_specs(lvl)
        params[f"subpixel{lvl}"] = {
            "feat": seq(f"netSubpixel.{i}.netFeat", len(ss["feat"])),
            "main": seq(f"netSubpixel.{i}.netMain", len(ss["main"])),
        }
        rs = _regularization_specs(lvl)
        params[f"regularization{lvl}"] = {
            "feat": seq(f"netRegularization.{i}.netFeat", len(rs["feat"])),
            "main": seq(f"netRegularization.{i}.netMain", len(rs["main"])),
            "dist": seq(f"netRegularization.{i}.netDist", len(rs["dist"])),
            "scale_x": seq(f"netRegularization.{i}.netScaleX", 1),
            "scale_y": seq(f"netRegularization.{i}.netScaleY", 1),
        }
    return params


# -------------------------------------------------------------------- forward

def _run_convs(x, convs, final_plain: bool = False, stride_first: int = 1):
    for i, p in enumerate(convs):
        x = _conv(x, p, stride=stride_first if i == 0 else 1)
        if not (final_plain and i == len(convs) - 1):
            x = _lrelu(x)
    return x


def _features(params, x):
    outs = []
    f = _run_convs(x, params["features"]["one"])
    outs.append(f)
    for name, stride in (("two", 2), ("thr", 2), ("fou", 2), ("fiv", 2), ("six", 2)):
        f = _run_convs(f, params["features"][name], stride_first=stride)
        outs.append(f)
    return outs  # levels 1..6 at scales 1, 1/2, ..., 1/32


def _matching(p, lvl, feat1, feat2, flow):
    feat1 = _run_convs(feat1, p["feat"]) if p["feat"] else feat1
    feat2 = _run_convs(feat2, p["feat"]) if p["feat"] else feat2
    if flow is not None:
        # learned x2 upsampling; the flow UNIT is scale-invariant (the
        # per-level _FLOW_SCALE doubles instead), so no value rescale
        flow = _deconv_grouped(flow, p["upflow"])
        feat2 = _warp(feat2, flow * _FLOW_SCALE[lvl])
    if "upcorr" in p:
        corr = _deconv_grouped(_correlation(feat1, feat2, stride=2), p["upcorr"])
    else:
        corr = _correlation(feat1, feat2, stride=1)
    res = _run_convs(corr, p["main"], final_plain=True)
    return res if flow is None else flow + res


def _subpixel(p, lvl, feat1, feat2, flow):
    feat1 = _run_convs(feat1, p["feat"]) if p["feat"] else feat1
    feat2 = _run_convs(feat2, p["feat"]) if p["feat"] else feat2
    warped = _warp(feat2, flow * _FLOW_SCALE[lvl])
    inp = jnp.concatenate([feat1, warped, flow], axis=-1)
    return flow + _run_convs(inp, p["main"], final_plain=True)


def _regularization(p, lvl, im1, im2, feat1, flow):
    diff = jnp.sqrt(jnp.sum(
        jnp.square(im1 - _warp(im2, flow * _FLOW_SCALE[lvl])), axis=-1, keepdims=True))
    centred = flow - jnp.mean(flow, axis=(1, 2), keepdims=True)
    feat = _run_convs(feat1, p["feat"]) if p["feat"] else feat1
    x = _run_convs(jnp.concatenate([diff, centred, feat], axis=-1), p["main"])
    # netDist: plain convs WITHOUT activations between/after
    for q in p["dist"]:
        x = _conv(x, q)
    logits = -jnp.square(x)
    w = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    div = 1.0 / jnp.sum(w, axis=-1, keepdims=True)
    u = _UNFOLD[lvl]
    fx = jnp.stack([s[..., 0] for s in _shifts(flow[..., :1], (u - 1) // 2)], axis=-1)
    fy = jnp.stack([s[..., 0] for s in _shifts(flow[..., 1:], (u - 1) // 2)], axis=-1)
    sx = _conv(w * fx, p["scale_x"][0]) * div
    sy = _conv(w * fy, p["scale_y"][0]) * div
    return jnp.concatenate([sx, sy], axis=-1)


def liteflownet_forward(params: Dict, im1, im2):
    """(B,H,W,3) BGR [0,1] pairs (H, W multiples of 32) -> (B,H/2,W/2,2)
    flow in full-resolution pixels (the x20 output scaling applied);
    jittable."""
    im1 = im1 - jnp.asarray(_MEAN_ONE)
    im2 = im2 - jnp.asarray(_MEAN_TWO)
    feats1 = _features(params, im1)
    feats2 = _features(params, im2)
    ims1, ims2 = [im1], [im2]
    for _ in range(5):
        B, H, W, C = ims1[-1].shape
        ims1.append(jax.image.resize(ims1[-1], (B, H // 2, W // 2, C), "bilinear"))
        ims2.append(jax.image.resize(ims2[-1], (B, H // 2, W // 2, C), "bilinear"))
    flow = None
    for lvl in (6, 5, 4, 3, 2):
        i = lvl - 1  # pyramid list index (level 1 = index 0)
        flow = _matching(params[f"matching{lvl}"], lvl, feats1[i], feats2[i], flow)
        flow = _subpixel(params[f"subpixel{lvl}"], lvl, feats1[i], feats2[i], flow)
        flow = _regularization(params[f"regularization{lvl}"], lvl,
                               ims1[i], ims2[i], feats1[i], flow)
    return flow * 20.0


def liteflownet_flow(frame1, frame2, params: Optional[Dict] = None) -> np.ndarray:
    """(H,W,3) RGB [0,1] frame pair -> (H,W,2) numpy pixel flow.
    Converts to BGR (caffe-trained weights), resizes to the nearest
    32-multiple, and rescales the flow back — the sniklaus inference
    recipe (`maua/flow/sniklaus.py:21-38`)."""
    if params is None:
        params = init_params(jax.random.PRNGKey(0))
    f1 = jnp.asarray(frame1, jnp.float32)[None][..., ::-1]
    f2 = jnp.asarray(frame2, jnp.float32)[None][..., ::-1]
    H, W = f1.shape[1:3]
    Hp = max(int(np.ceil(H / 32)) * 32, 32)
    Wp = max(int(np.ceil(W / 32)) * 32, 32)
    f1 = jax.image.resize(f1, (1, Hp, Wp, 3), "bilinear")
    f2 = jax.image.resize(f2, (1, Hp, Wp, 3), "bilinear")
    flow = liteflownet_forward(params, f1, f2)  # (1, Hp/2, Wp/2, 2)
    flow = jax.image.resize(flow, (1, H, W, 2), "bilinear")
    flow = flow * jnp.asarray([W / Wp, H / Hp])
    return np.asarray(flow[0])
