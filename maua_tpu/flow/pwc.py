"""PWC-Net optical flow (pyramid, warping, cost volume).

Completes the reference's declared estimator ensemble
(`maua/flow/__init__.py:9-64`; sniklaus adapter `maua/flow/sniklaus.py:
21-38` — the actual net lives in a stripped submodule). TPU-native
formulation of the sniklaus `pytorch-pwc` architecture:

- 6-level feature pyramid (3 convs per level, stride-2 first);
- per-level cost volume over a 9x9 displacement window as 81 static
  shifted products (channel-mean, leaky-relu) — static slices instead
  of the reference's compiled CUDA correlation op, so XLA fuses the
  whole volume;
- DenseNet decoder per level on [corr, feat1, upflow, upfeat] with
  4x4/2 transposed convs carrying flow+features up the pyramid
  (implemented as lhs-dilated convs — the TPU-native transposed conv);
- dilated context refiner at the finest level.

Weights convert from the published `network-default.pytorch` state
dict via `params_from_torch` (OIHW -> HWIO; transposed convs flip
spatially and swap in/out). Structure + converter are oracle-tested
against torch ops in tests/test_flow.py.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")

# feature pyramid channels per level (level 1..6)
_FEAT_CH = [16, 32, 64, 96, 128, 196]
# decoder levels run 6 -> 2; feat1 channels concatenated below level 6
_DEC_FEAT = {6: 0, 5: 128, 4: 96, 3: 64, 2: 32}
# warped-feature flow scaling per level (sniklaus backwarp constants)
_FLOW_SCALE = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}
_DENSE = [128, 128, 96, 64, 32]  # dense decoder widths; final conv -> 2


def _corr_in(level: int) -> int:
    base = 81 + _DEC_FEAT[level]
    return base if level == 6 else base + 2 + 2  # + upflow + upfeat


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def _conv(x, p, stride=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME", rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN,
    ) + p["b"]


def _deconv(x, p):
    """4x4 stride-2 pad-1 transposed conv as an lhs-dilated conv.
    p["w"] is HWIO with the kernel already spatially flipped and
    in/out-swapped by the converter (torch ConvTranspose2d weights are
    (in, out, kh, kw) applied as the gradient of a forward conv)."""
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=_DN,
    ) + p["b"]


def _correlation(f1, f2, radius: int = 4):
    """Cost volume: (B,H,W,C) x2 -> (B,H,W,(2r+1)^2) channel-mean
    correlation over integer displacements, leaky-relu'd (matching the
    reference's CUDA correlation + LeakyReLU(0.1))."""
    B, H, W, C = f1.shape
    pad = jnp.pad(f2, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    outs = []
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            shifted = jax.lax.dynamic_slice(pad, (0, dy, dx, 0), (B, H, W, C))
            outs.append(jnp.mean(f1 * shifted, axis=-1))
    return _lrelu(jnp.stack(outs, axis=-1))


def _warp(img, flow):
    from ..ops.warp import grid_sample, identity_grid

    B, H, W, _ = img.shape
    grid = identity_grid(B, H, W)
    norm = jnp.asarray([2.0 / W, 2.0 / H])
    return grid_sample(img, grid + flow * norm, padding_mode="zeros")


def init_params(key) -> Dict:
    """Random-init parameter pytree with the exact converter layout."""
    def conv(key, kh, kw, ci, co):
        return {"w": jax.random.normal(key, (kh, kw, ci, co)) * (1.0 / np.sqrt(kh * kw * ci)),
                "b": jnp.zeros((co,))}

    keys = iter(jax.random.split(key, 128))
    extractor = []
    ci = 3
    for co in _FEAT_CH:
        extractor.append([conv(next(keys), 3, 3, ci, co),
                          conv(next(keys), 3, 3, co, co),
                          conv(next(keys), 3, 3, co, co)])
        ci = co
    decoders = {}
    for lvl in (6, 5, 4, 3, 2):
        cin = _corr_in(lvl)
        convs = []
        c = cin
        for w_ in _DENSE:
            convs.append(conv(next(keys), 3, 3, c, w_))
            c += w_
        convs.append(conv(next(keys), 3, 3, c, 2))
        dec = {"convs": convs}
        if lvl != 6:  # upsamples the COARSER level's flow + features
            c_prev = _corr_in(lvl + 1) + sum(_DENSE)
            dec["upflow"] = conv(next(keys), 4, 4, 2, 2)
            dec["upfeat"] = conv(next(keys), 4, 4, c_prev, 2)
        decoders[lvl] = dec
    refiner = []
    rch = [(_corr_in(2) + sum(_DENSE), 128, 1), (128, 128, 2), (128, 128, 4),
           (128, 96, 8), (96, 64, 16), (64, 32, 1), (32, 2, 1)]
    for ci_, co_, _d in rch:
        refiner.append(conv(next(keys), 3, 3, ci_, co_))
    return {"extractor": extractor, "decoders": decoders, "refiner": refiner,
            "refiner_dil": tuple(d for _, _, d in rch)}


def params_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """Convert a sniklaus pytorch-pwc state dict to the pytree.
    Extractor keys `netExtractor.net{One..Six}.{0,2,4}.*`, decoders
    `net{Two..Six}.net{One..Fiv,Six}.0.*` + `netUpflow/netUpfeat`,
    refiner `netRefiner.netMain.{0,2,...,12}.*`."""
    names = ["netOne", "netTwo", "netThr", "netFou", "netFiv", "netSix"]

    def cv(prefix):  # forward conv OIHW -> HWIO
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))}

    def dcv(prefix):  # ConvTranspose2d (in,out,kh,kw) -> flipped HWIO
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
        w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # (kh,kw,in,out)
        return {"w": jnp.asarray(np.ascontiguousarray(w)),
                "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))}

    extractor = [[cv(f"netExtractor.{nm}.{i}") for i in (0, 2, 4)] for nm in names]
    decoders = {}
    for lvl, nm in ((6, "netSix"), (5, "netFiv"), (4, "netFou"), (3, "netThr"), (2, "netTwo")):
        convs = [cv(f"{nm}.{sub}.0") for sub in names]
        dec = {"convs": convs}
        if lvl != 6:
            dec["upflow"] = dcv(f"{nm}.netUpflow")
            dec["upfeat"] = dcv(f"{nm}.netUpfeat")
        decoders[lvl] = dec
    refiner = [cv(f"netRefiner.netMain.{i}") for i in (0, 2, 4, 6, 8, 10, 12)]
    return {"extractor": extractor, "decoders": decoders, "refiner": refiner,
            "refiner_dil": (1, 2, 4, 8, 16, 1, 1)}


def _decode_level(dec, corr_in):
    x = corr_in
    feats = x
    for conv in dec["convs"][:-1]:
        x = _lrelu(_conv(feats, conv))
        feats = jnp.concatenate([x, feats], axis=-1)
    flow = _conv(feats, dec["convs"][-1])
    return flow, feats


def pwc_forward(params: Dict, im1, im2):
    """(B,H,W,3) images in [0,1] (H, W multiples of 64) ->
    (B,H/4,W/4,2) flow in 1/20-scaled units (multiply by 20 for pixels
    at quarter res — the published checkpoint's convention); jittable."""
    feats1, feats2 = [], []
    x1, x2 = im1, im2
    for level in params["extractor"]:
        for i, conv in enumerate(level):
            s = 2 if i == 0 else 1
            x1 = _lrelu(_conv(x1, conv, stride=s))
            x2 = _lrelu(_conv(x2, conv, stride=s))
        feats1.append(x1)
        feats2.append(x2)

    flow = None
    feat = None
    for lvl in (6, 5, 4, 3, 2):
        f1, f2 = feats1[lvl - 1], feats2[lvl - 1]
        if lvl == 6:
            corr = _correlation(f1, f2)
            inp = corr
        else:
            dec = params["decoders"][lvl]
            upflow = _deconv(flow, dec["upflow"])
            upfeat = _deconv(feat, dec["upfeat"])
            warped = _warp(f2, upflow * _FLOW_SCALE[lvl])
            corr = _correlation(f1, warped)
            inp = jnp.concatenate([corr, f1, upflow, upfeat], axis=-1)
        flow, feat = _decode_level(params["decoders"][lvl], inp)

    x = feat
    for conv, dil in zip(params["refiner"][:-1], params["refiner_dil"][:-1]):
        x = _lrelu(_conv(x, conv, dilation=dil))
    return flow + _conv(x, params["refiner"][-1])


def pwc_flow(frame1, frame2, params: Dict = None) -> np.ndarray:
    """(H,W,3) [0,1] frame pair -> (H,W,2) numpy pixel flow. Resizes to
    the nearest 64-multiple and rescales the flow back (the published
    inference recipe, including the x20 output scale)."""
    if params is None:
        params = init_params(jax.random.PRNGKey(0))
    # The published sniklaus pytorch-pwc weights consume BGR in [0,1]
    # (upstream loads frames with [:, :, ::-1]; the reference adapter does
    # im[:, [2, 1, 0]]). PWC has no normalization layer to absorb a channel
    # swap, so flip here — callers pass RGB.
    f1 = jnp.asarray(frame1, jnp.float32)[None, ..., ::-1]
    f2 = jnp.asarray(frame2, jnp.float32)[None, ..., ::-1]
    H, W = f1.shape[1:3]
    Hp = max(int(np.ceil(H / 64)) * 64, 64)
    Wp = max(int(np.ceil(W / 64)) * 64, 64)
    f1 = jax.image.resize(f1, (1, Hp, Wp, 3), "bilinear")
    f2 = jax.image.resize(f2, (1, Hp, Wp, 3), "bilinear")
    flow = pwc_forward(params, f1, f2) * 20.0
    flow = jax.image.resize(flow, (1, H, W, 2), "bilinear")
    flow = flow * jnp.asarray([W / Wp, H / Hp])
    return np.asarray(flow[0])
