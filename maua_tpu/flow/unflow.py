"""UnFlow optical flow (CSS stack: FlowNetC + two FlowNetS refiners).

Completes the reference's declared estimator ensemble
(`maua/flow/__init__.py:9-64`; sniklaus adapter `maua/flow/sniklaus.py:
40-52` — the actual net lives in a stripped submodule). TPU-native
formulation of the UnFlow-CSS architecture (Meister et al., AAAI'18;
the published pytorch port packages it as one stacked network):

- stage 1 FlowNetC: siamese 3-conv encoder to 1/8 resolution, a
  21x21-displacement correlation volume at stride-2 displacement
  sampling (441 channels, built as static shifted products so XLA
  fuses it), a 1x1 "redirect" shortcut of the first image's features,
  then the FlowNet encoder/decoder with flow predictions at 1/64..1/4
  and learned 4x4/2 transposed-conv upsampling between scales;
- stages 2+3 FlowNetS: each re-estimates flow from
  [im1, im2, warp(im2, flow), flow, brightness error] (12 channels)
  with the same encoder/decoder, warping with the previous stage's
  full-resolution flow — the stacked-refinement semantics that make
  UnFlow's ensemble contribution distinct from single-shot nets.

All transposed convs run as lhs-dilated convs (the TPU-native
formulation); the correlation is leaky-relu'd channel-mean like the
reference CUDA op. Weights convert from the published `network-css.
pytorch` state dict layout via `params_from_torch` (`netFlownets.{i}`
module list, stage 0 = FlowNetC).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")

_CORR_RADIUS = 20  # max displacement, sampled every 2 px -> 21x21 = 441
_CORR_STEP = 2


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def _conv(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME", dimension_numbers=_DN
    ) + p["b"]


def _deconv(x, p):
    """4x4 stride-2 pad-1 transposed conv as an lhs-dilated conv (the
    converter pre-flips the kernel into HWIO)."""
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=_DN,
    ) + p["b"]


def _correlation(f1, f2):
    """(B,H,W,C) x2 -> (B,H,W,441) channel-mean correlation over the
    21x21 stride-2 displacement grid, leaky-relu'd."""
    B, H, W, C = f1.shape
    r = _CORR_RADIUS
    pad = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    outs = []
    for dy in range(0, 2 * r + 1, _CORR_STEP):
        for dx in range(0, 2 * r + 1, _CORR_STEP):
            shifted = jax.lax.dynamic_slice(pad, (0, dy, dx, 0), (B, H, W, C))
            outs.append(jnp.mean(f1 * shifted, axis=-1))
    return _lrelu(jnp.stack(outs, axis=-1))


def _warp(img, flow):
    from ..ops.warp import grid_sample, identity_grid

    B, H, W, _ = img.shape
    grid = identity_grid(B, H, W)
    norm = jnp.asarray([2.0 / W, 2.0 / H])
    return grid_sample(img, grid + flow * norm, padding_mode="zeros")


# --------------------------------------------------------------------- params

# encoder specs shared by C and S stages from conv4 down
_TAIL = [("fou", 3, 256, 512, 2), ("fou_1", 3, 512, 512, 1),
         ("fiv", 3, 512, 512, 2), ("fiv_1", 3, 512, 512, 1),
         ("six", 3, 512, 1024, 2), ("six_1", 3, 1024, 1024, 1)]

# decoder: (name, skip channels at that scale) — skip5 = conv5_1 out,
# skip4 = conv4_1 out, skip3 = conv3(_1) out, skip2 = conv2 out
_DEC = [("fiv", 512, 1024), ("fou", 256, 512 + 512 + 2),
        ("thr", 128, 512 + 256 + 2), ("two", 64, 256 + 128 + 2)]


def _stage_specs(complex_: bool):
    if complex_:
        enc = [("one", 7, 3, 64, 2), ("two", 5, 64, 128, 2), ("thr", 5, 128, 256, 2)]
        enc += [("redir", 1, 256, 32, 1), ("combined", 3, 441 + 32, 256, 1)]
    else:
        enc = [("one", 7, 12, 64, 2), ("two", 5, 64, 128, 2),
               ("thr", 5, 128, 256, 2), ("thr_1", 3, 256, 256, 1)]
    return enc + _TAIL


def init_params(key, stages: int = 3) -> List[Dict]:
    """Random-init CSS parameter pytrees ([FlowNetC, FlowNetS, ...])
    with the exact converter layout."""
    def conv(kh, kw, ci, co):
        nonlocal key
        key, sub = jax.random.split(key)
        return {"w": jax.random.normal(sub, (kh, kw, ci, co)) * (1.0 / np.sqrt(kh * kw * ci)),
                "b": jnp.zeros((co,))}

    nets = []
    for s in range(stages):
        p: Dict = {}
        for name, k, ci, co, _stride in _stage_specs(complex_=(s == 0)):
            p[name] = conv(k, k, ci, co)
        p["flow_six"] = conv(3, 3, 1024, 2)
        for name, co, cin in _DEC:
            p[f"up_{name}"] = conv(4, 4, cin if name == "fiv" else cin, co)
            p[f"upflow_{name}"] = conv(4, 4, 2, 2)
        p["flow_fiv"] = conv(3, 3, 512 + 512 + 2, 2)
        p["flow_fou"] = conv(3, 3, 512 + 256 + 2, 2)
        p["flow_thr"] = conv(3, 3, 256 + 128 + 2, 2)
        p["flow_two"] = conv(3, 3, 128 + 64 + 2, 2)
        nets.append(p)
    return nets


def params_from_torch(sd: Dict[str, np.ndarray], stages: int = 3) -> List[Dict]:
    """Convert a pytorch-unflow CSS state dict (`netFlownets.{i}.*`,
    stage 0 the FlowNetC) to the NHWC/HWIO pytrees. Plain convs
    transpose OIHW -> HWIO; transposed convs ((in, out, kh, kw)) flip
    spatially and keep (in, out) as (I, O)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def conv(name):
        w = sd[f"{name}.weight"]
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(sd[f"{name}.bias"])}

    def deconv(name):
        w = sd[f"{name}.weight"]  # (in, out, kh, kw)
        return {"w": jnp.asarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)),
                "b": jnp.asarray(sd[f"{name}.bias"])}

    nets = []
    for s in range(stages):
        pre = f"netFlownets.{s}"
        p: Dict = {}
        for name, *_ in _stage_specs(complex_=(s == 0)):
            # sequential modules carry the conv at index 0 (LReLU at 1)
            p[name] = conv(f"{pre}.net{name.title().replace('_', '')}.0")
        p["flow_six"] = conv(f"{pre}.netUpconv.netSixOut.0")
        for name, _co, _cin in _DEC:
            p[f"up_{name}"] = deconv(f"{pre}.netUpconv.net{name.title()}Next.0")
            p[f"upflow_{name}"] = deconv(f"{pre}.netUpconv.net{name.title()}Up.0")
        for name in ("fiv", "fou", "thr", "two"):
            p[f"flow_{name}"] = conv(f"{pre}.netUpconv.net{name.title()}Out.0")
        nets.append(p)
    return nets


# -------------------------------------------------------------------- forward

def _decoder(p, feats):
    """FlowNet refinement: feats = dict of encoder activations by
    scale name; returns flow at 1/4 resolution (network units)."""
    x6 = feats["six_1"]
    flow6 = _conv(x6, p["flow_six"])
    up5 = _lrelu(_deconv(x6, p["up_fiv"]))
    uf5 = _deconv(flow6, p["upflow_fiv"])
    cat5 = jnp.concatenate([feats["fiv_1"], up5, uf5], axis=-1)
    flow5 = _conv(cat5, p["flow_fiv"])
    up4 = _lrelu(_deconv(cat5, p["up_fou"]))
    uf4 = _deconv(flow5, p["upflow_fou"])
    cat4 = jnp.concatenate([feats["fou_1"], up4, uf4], axis=-1)
    flow4 = _conv(cat4, p["flow_fou"])
    up3 = _lrelu(_deconv(cat4, p["up_thr"]))
    uf3 = _deconv(flow4, p["upflow_thr"])
    cat3 = jnp.concatenate([feats["thr_out"], up3, uf3], axis=-1)
    flow3 = _conv(cat3, p["flow_thr"])
    up2 = _lrelu(_deconv(cat3, p["up_two"]))
    uf2 = _deconv(flow3, p["upflow_two"])
    cat2 = jnp.concatenate([feats["two_out"], up2, uf2], axis=-1)
    return _conv(cat2, p["flow_two"])


def _encoder_tail(p, x, feats):
    x = _lrelu(_conv(x, p["fou"], stride=2))
    x = _lrelu(_conv(x, p["fou_1"]))
    feats["fou_1"] = x
    x = _lrelu(_conv(x, p["fiv"], stride=2))
    x = _lrelu(_conv(x, p["fiv_1"]))
    feats["fiv_1"] = x
    x = _lrelu(_conv(x, p["six"], stride=2))
    x = _lrelu(_conv(x, p["six_1"]))
    feats["six_1"] = x
    return feats


def _flownet_c(p, im1, im2):
    feats = {}
    a = _lrelu(_conv(im1, p["one"], stride=2))
    b = _lrelu(_conv(im2, p["one"], stride=2))
    feats["two_out"] = a2 = _lrelu(_conv(a, p["two"], stride=2))
    b2 = _lrelu(_conv(b, p["two"], stride=2))
    a3 = _lrelu(_conv(a2, p["thr"], stride=2))
    b3 = _lrelu(_conv(b2, p["thr"], stride=2))
    corr = _correlation(a3, b3)
    redir = _lrelu(_conv(a3, p["redir"]))
    x = _lrelu(_conv(jnp.concatenate([corr, redir], axis=-1), p["combined"]))
    feats["thr_out"] = x
    return _decoder(p, _encoder_tail(p, x, feats))


def _flownet_s(p, inp):
    feats = {}
    x = _lrelu(_conv(inp, p["one"], stride=2))
    feats["two_out"] = x = _lrelu(_conv(x, p["two"], stride=2))
    x = _lrelu(_conv(x, p["thr"], stride=2))
    x = _lrelu(_conv(x, p["thr_1"]))
    feats["thr_out"] = x
    return _decoder(p, _encoder_tail(p, x, feats))


def unflow_forward(params: List[Dict], im1, im2):
    """(B,H,W,3) [0,1] RGB pairs (H, W multiples of 64) -> (B,H,W,2)
    pixel flow; jittable. Each stage's 1/4-resolution output (FlowNet
    1/20-unit convention) upsamples to full resolution before feeding
    the next stage's warp."""
    B, H, W, _ = im1.shape
    # per-image channel-mean centering (FlowNet-family preprocessing)
    n1 = im1 - jnp.mean(im1, axis=(1, 2), keepdims=True)
    n2 = im2 - jnp.mean(im2, axis=(1, 2), keepdims=True)
    flow = None
    for i, p in enumerate(params):
        if i == 0:
            q = _flownet_c(p, n1, n2)
        else:
            warped = _warp(im2, flow)
            err = jnp.sqrt(jnp.sum(jnp.square(im1 - warped), axis=-1, keepdims=True))
            inp = jnp.concatenate([n1, n2, warped - jnp.mean(im2, axis=(1, 2), keepdims=True),
                                   flow / 20.0, err], axis=-1)
            q = _flownet_s(p, inp)
        flow = jax.image.resize(q, (B, H, W, 2), "bilinear") * 20.0
    return flow


def unflow_flow(frame1, frame2, params: Optional[List[Dict]] = None) -> np.ndarray:
    """(H,W,3) RGB [0,1] frame pair -> (H,W,2) numpy pixel flow.
    Resizes to the nearest 64-multiple and rescales the flow back (the
    sniklaus inference recipe, `maua/flow/sniklaus.py:40-52`)."""
    if params is None:
        params = init_params(jax.random.PRNGKey(0))
    f1 = jnp.asarray(frame1, jnp.float32)[None]
    f2 = jnp.asarray(frame2, jnp.float32)[None]
    H, W = f1.shape[1:3]
    Hp = max(int(np.ceil(H / 64)) * 64, 64)
    Wp = max(int(np.ceil(W / 64)) * 64, 64)
    f1 = jax.image.resize(f1, (1, Hp, Wp, 3), "bilinear")
    f2 = jax.image.resize(f2, (1, Hp, Wp, 3), "bilinear")
    flow = unflow_forward(params, f1, f2)
    if (Hp, Wp) != (H, W):
        flow = jax.image.resize(flow, (1, H, W, 2), "bilinear")
        flow = flow * jnp.asarray([W / Wp, H / Hp])
    return np.asarray(flow[0])
