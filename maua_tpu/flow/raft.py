"""RAFT optical flow (Teed & Deng 2020), functional JAX/TPU-native.

Rebuild of the RAFT/GMA estimators the reference reaches through the
stripped mmflow submodules (`maua/flow/mm.py:73`, selected in
`maua/flow/__init__.py:9-64`): all-pairs correlation + iterative GRU
refinement at 1/8 resolution, with learned convex upsampling.

TPU-first choices:
- the all-pairs correlation volume is one big MXU matmul
  ((B, H8*W8, 256) @ (B, 256, H8*W8));
- the 4-level pyramid lookup is a batched `grid_sample` over the
  flattened volume (one gather per level per iteration — everything
  else is convs/matmuls);
- refinement iterations run under `lax.scan` with a static trip count
  (one compile per `iters`), carrying (hidden, flow);
- NHWC throughout; instance-norm in the feature encoder, no norm in
  the context encoder tail (matching torchvision's raft_large layout
  so `params_from_torch` converts its checkpoints directly).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import grid_sample


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    feat_dims: Tuple[int, int, int] = (64, 96, 128)
    feat_out: int = 256
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    dtype: str = "float32"


TINY_RAFT = RAFTConfig(feat_dims=(8, 12, 16), feat_out=24, hidden_dim=16,
                       context_dim=16, corr_levels=2, corr_radius=2, iters=3)


# ------------------------------------------------------------- params
def _conv_init(key, ci, co, k):
    s = 1.0 / np.sqrt(ci * k * k)
    return {"w": jax.random.normal(key, (k, k, ci, co)) * s, "b": jnp.zeros((co,))}


def conv(p, x, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)


def _norm_init(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _instance_norm(p, x):
    if "frozen" in p:
        # folded frozen BatchNorm (running stats baked into g/b by the
        # torchvision converter) — a pure affine, no spatial stats
        return x * p["g"] + p["b"]
    mu = x.mean((1, 2), keepdims=True)
    var = x.var((1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]


def _init_resblock(key, ci, co, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(ks[0], ci, co, 3), "norm1": _norm_init(co),
        "conv2": _conv_init(ks[1], co, co, 3), "norm2": _norm_init(co),
    }
    if stride != 1 or ci != co:
        p["down"] = _conv_init(ks[2], ci, co, 1)
        p["dnorm"] = _norm_init(co)
    return p


def _resblock(p, x, stride):
    y = jax.nn.relu(_instance_norm(p["norm1"], conv(p["conv1"], x, stride)))
    y = jax.nn.relu(_instance_norm(p["norm2"], conv(p["conv2"], y)))
    if "down" in p:
        x = _instance_norm(p["dnorm"], conv(p["down"], x, stride))
    return jax.nn.relu(x + y)


def _init_encoder(key, cfg: RAFTConfig, out_dim: int):
    d1, d2, d3 = cfg.feat_dims
    ks = iter(jax.random.split(key, 16))
    nk = lambda: next(ks)
    return {
        "conv1": _conv_init(nk(), 3, d1, 7), "norm1": _norm_init(d1),
        "layer1": [_init_resblock(nk(), d1, d1, 1), _init_resblock(nk(), d1, d1, 1)],
        "layer2": [_init_resblock(nk(), d1, d2, 2), _init_resblock(nk(), d2, d2, 1)],
        "layer3": [_init_resblock(nk(), d2, d3, 2), _init_resblock(nk(), d3, d3, 1)],
        "conv2": _conv_init(nk(), d3, out_dim, 1),
    }


def _encoder(p, x):
    y = jax.nn.relu(_instance_norm(p["norm1"], conv(p["conv1"], x, 2)))
    for blk, stride in ((p["layer1"][0], 1), (p["layer1"][1], 1),
                        (p["layer2"][0], 2), (p["layer2"][1], 1),
                        (p["layer3"][0], 2), (p["layer3"][1], 1)):
        y = _resblock(blk, y, stride)
    return conv(p["conv2"], y)


def init_params(key, cfg: RAFTConfig = RAFTConfig(), gma: bool = False) -> Dict:
    ks = iter(jax.random.split(key, 32))
    nk = lambda: next(ks)
    ncorr = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    hd, cd = cfg.hidden_dim, cfg.context_dim
    # hidden + motion(128) + context (+ globally-aggregated motion for GMA)
    gin = hd + 128 + cd + (128 if gma else 0)
    gru = {}
    for g in ("z", "r", "q"):
        # SepConvGRU: horizontal (1x5) then vertical (5x1) passes
        gru[f"{g}1"] = {"w": jax.random.normal(nk(), (1, 5, gin, hd)) * 0.01, "b": jnp.zeros((hd,))}
        gru[f"{g}2"] = {"w": jax.random.normal(nk(), (5, 1, gin, hd)) * 0.01, "b": jnp.zeros((hd,))}
    out_gma = {
        "to_qk": _conv_init(nk(), cd, 2 * 128, 1),
        "to_v": _conv_init(nk(), 128, 128, 1),
        "gamma": jnp.zeros(()),
    } if gma else None
    return {
        **({"gma": out_gma} if gma else {}),
        "fnet": _init_encoder(nk(), cfg, cfg.feat_out),
        "cnet": _init_encoder(nk(), cfg, hd + cd),
        "motion": {
            "convc1": _conv_init(nk(), ncorr, 256, 1),
            "convc2": _conv_init(nk(), 256, 192, 3),
            "convf1": _conv_init(nk(), 2, 128, 7),
            "convf2": _conv_init(nk(), 128, 64, 3),
            "conv": _conv_init(nk(), 192 + 64, 128 - 2, 3),
        },
        "gru": gru,
        "flow_head": {
            "conv1": _conv_init(nk(), hd, 256, 3),
            "conv2": _conv_init(nk(), 256, 2, 3),
        },
        "mask": {
            "conv1": _conv_init(nk(), hd, 256, 3),
            "conv2": _conv_init(nk(), 256, 64 * 9, 1),
        },
    }


# -------------------------------------------------------- correlation
def _corr_pyramid(f1: jax.Array, f2: jax.Array, levels: int) -> List[jax.Array]:
    """All-pairs correlation: f1, f2 (B, H8, W8, D) ->
    [(B*H8*W8, h_l, w_l, 1)] per level."""
    b, h, w, d = f1.shape
    a = f1.reshape(b, h * w, d)
    bm = f2.reshape(b, h * w, d)
    corr = jnp.einsum("bnd,bmd->bnm", a, bm) / jnp.sqrt(jnp.float32(d)).astype(f1.dtype)
    corr = corr.reshape(b * h * w, h, w, 1)
    pyr = [corr]
    for _ in range(levels - 1):
        hh, ww = pyr[-1].shape[1] // 2, pyr[-1].shape[2] // 2
        corr = jax.lax.reduce_window(
            pyr[-1], 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        pyr.append(corr)
    return pyr


def _lookup(pyr: List[jax.Array], coords: jax.Array, radius: int) -> jax.Array:
    """Sample the correlation pyramid around `coords` (B, H8, W8, 2 in
    pixels at 1/8 res) -> (B, H8, W8, levels*(2r+1)^2)."""
    b, h, w, _ = coords.shape
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dgrid = jnp.stack(jnp.meshgrid(dx, dx, indexing="xy"), axis=-1)  # (2r+1, 2r+1, 2)
    outs = []
    for lvl, corr in enumerate(pyr):
        hl, wl = corr.shape[1], corr.shape[2]
        c = coords.reshape(b * h * w, 1, 1, 2) / (2.0 ** lvl) + dgrid[None]
        # normalize to [-1, 1] (align_corners=False convention)
        cn = jnp.stack([
            (c[..., 0] + 0.5) * (2.0 / wl) - 1.0,
            (c[..., 1] + 0.5) * (2.0 / hl) - 1.0,
        ], axis=-1)
        sampled = grid_sample(corr, cn, padding_mode="zeros")  # (BHW, 2r+1, 2r+1, 1)
        outs.append(sampled.reshape(b, h, w, (2 * r + 1) ** 2))
    return jnp.concatenate(outs, axis=-1)


# ------------------------------------------------------------ update
def _motion_encoder(p, flow, corr):
    c = jax.nn.relu(conv(p["convc1"], corr))
    c = jax.nn.relu(conv(p["convc2"], c))
    f = jax.nn.relu(conv(p["convf1"], flow))
    f = jax.nn.relu(conv(p["convf2"], f))
    out = jax.nn.relu(conv(p["conv"], jnp.concatenate([c, f], -1)))
    return jnp.concatenate([out, flow], -1)  # 128


def _sep_gru(p, h, x):
    for ax in ("1", "2"):
        hx = jnp.concatenate([h, x], -1)
        z = jax.nn.sigmoid(conv(p[f"z{ax}"], hx))
        r = jax.nn.sigmoid(conv(p[f"r{ax}"], hx))
        q = jnp.tanh(conv(p[f"q{ax}"], jnp.concatenate([r * h, x], -1)))
        h = (1 - z) * h + z * q
    return h


def _upsample_flow(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """Convex upsampling x8: flow (B, H, W, 2), mask (B, H, W, 576)."""
    b, h, w, _ = flow.shape
    m = jax.nn.softmax(mask.reshape(b, h, w, 9, 64), axis=3)
    # 3x3 neighborhood of the coarse flow, scaled x8
    pads = [(1, 1), (1, 1)]
    fp = jnp.pad(flow * 8.0, ((0, 0), *pads, (0, 0)))
    neigh = jnp.stack([fp[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)], axis=3)
    up = jnp.einsum("bhwnu,bhwnc->bhwuc", m, neigh)  # (B,H,W,64,2)
    up = up.reshape(b, h, w, 8, 8, 2).transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 8, w * 8, 2)
    return up


def forward(params: Dict, image1: jax.Array, image2: jax.Array,
            cfg: RAFTConfig = RAFTConfig(), iters: int | None = None) -> jax.Array:
    """images (B, H, W, 3) in [0, 1], H and W multiples of 8 ->
    flow (B, H, W, 2) in pixels."""
    iters = iters if iters is not None else cfg.iters
    x1 = image1 * 2.0 - 1.0
    x2 = image2 * 2.0 - 1.0
    f1 = _encoder(params["fnet"], x1)
    f2 = _encoder(params["fnet"], x2)
    pyr = _corr_pyramid(f1, f2, cfg.corr_levels)

    cnet = _encoder(params["cnet"], x1)
    hidden = jnp.tanh(cnet[..., : cfg.hidden_dim])
    context = jax.nn.relu(cnet[..., cfg.hidden_dim :])

    b, h8, w8, _ = f1.shape
    gy, gx = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                          jnp.arange(w8, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (b, h8, w8, 2))

    # GMA (Jiang et al. 2021): attention over CONTEXT features,
    # computed once; each iteration aggregates motion features
    # globally through it (one (B, HW, HW) MXU matmul per step)
    attn = None
    if params.get("gma") is not None:
        qk = conv(params["gma"]["to_qk"], context)
        q, k = qk[..., :128].reshape(b, h8 * w8, 128), qk[..., 128:].reshape(b, h8 * w8, 128)
        attn = jax.nn.softmax(
            jnp.einsum("bnd,bmd->bnm", q, k) * (128 ** -0.5), axis=-1)

    def step(carry, _):
        hidden, flow = carry
        corr = _lookup(pyr, coords0 + flow, cfg.corr_radius)
        motion = _motion_encoder(params["motion"], flow, corr)
        # GRU input channel order follows the checkpoints the converters
        # target: torchvision raft_large cats [context, motion]; zacjiang/GMA
        # builds inp_cat = cat([inp(context), motion, motion_global]). The
        # converters copy GRU conv weights without permutation, so this order
        # is load-bearing for pretrained weights.
        if attn is not None:
            v = conv(params["gma"]["to_v"], motion).reshape(b, h8 * w8, 128)
            agg = jnp.einsum("bnm,bmd->bnd", attn, v).reshape(b, h8, w8, 128)
            motion_global = motion + params["gma"]["gamma"] * agg
            inp = jnp.concatenate([context, motion, motion_global], -1)
        else:
            inp = jnp.concatenate([context, motion], -1)
        hidden = _sep_gru(params["gru"], hidden, inp)
        dflow = conv(params["flow_head"]["conv2"],
                     jax.nn.relu(conv(params["flow_head"]["conv1"], hidden)))
        return (hidden, flow + dflow), None

    flow0 = jnp.zeros((b, h8, w8, 2), x1.dtype)
    (hidden, flow), _ = jax.lax.scan(step, (hidden, flow0), None, length=iters)

    mask = conv(params["mask"]["conv2"],
                jax.nn.relu(conv(params["mask"]["conv1"], hidden))) * 0.25
    return _upsample_flow(flow, mask)


# --------------------------------------------------------- conversion
def params_from_torch(sd: Dict[str, np.ndarray], cfg: RAFTConfig = RAFTConfig()) -> Dict:
    """torchvision `raft_large` state dict -> pytree. Conv weights
    OIHW -> HWIO; instance/identity norms map to (g, b)."""

    def cv(name):
        return {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))),
                "b": jnp.asarray(sd.get(f"{name}.bias", np.zeros(sd[f"{name}.weight"].shape[0], np.float32)))}

    def nrm(name, c):
        if f"{name}.running_mean" in sd:
            # frozen BatchNorm2d (torchvision raft_large context
            # encoder): fold running stats into an affine
            g = sd[f"{name}.weight"] / np.sqrt(sd[f"{name}.running_var"] + 1e-5)
            b = sd[f"{name}.bias"] - sd[f"{name}.running_mean"] * g
            return {"g": jnp.asarray(g), "b": jnp.asarray(b), "frozen": jnp.ones(())}
        if f"{name}.weight" in sd:
            return {"g": jnp.asarray(sd[f"{name}.weight"]), "b": jnp.asarray(sd[f"{name}.bias"])}
        return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}

    def enc(base, out_dim):
        d1, d2, d3 = cfg.feat_dims
        p = {"conv1": cv(f"{base}.convnormrelu.0"), "norm1": nrm(f"{base}.convnormrelu.1", d1),
             "conv2": cv(f"{base}.conv"),
             "layer1": [], "layer2": [], "layer3": []}
        for li, (dims, layer) in enumerate(zip(((d1, d1), (d1, d2), (d2, d3)),
                                               ("layer1", "layer2", "layer3"))):
            ci, co = dims
            for bi in range(2):
                bbase = f"{base}.{layer}.{bi}"
                blk = {
                    "conv1": cv(f"{bbase}.convnormrelu1.0"), "norm1": nrm(f"{bbase}.convnormrelu1.1", co),
                    "conv2": cv(f"{bbase}.convnormrelu2.0"), "norm2": nrm(f"{bbase}.convnormrelu2.1", co),
                }
                if f"{bbase}.downsample.0.weight" in sd:
                    blk["down"] = cv(f"{bbase}.downsample.0")
                    blk["dnorm"] = nrm(f"{bbase}.downsample.1", co)
                p[layer].append(blk)
        return p

    mb = "update_block.motion_encoder"
    gb = "update_block.recurrent_block"
    fb = "update_block.flow_head"
    gru = {}
    for g, tv in (("z", "convz"), ("r", "convr"), ("q", "convq")):
        gru[f"{g}1"] = cv(f"{gb}.convgru1.{tv}")
        gru[f"{g}2"] = cv(f"{gb}.convgru2.{tv}")
    return {
        "fnet": enc("feature_encoder", cfg.feat_out),
        "cnet": enc("context_encoder", cfg.hidden_dim + cfg.context_dim),
        "motion": {
            "convc1": cv(f"{mb}.convcorr1.0"), "convc2": cv(f"{mb}.convcorr2.0"),
            "convf1": cv(f"{mb}.convflow1.0"), "convf2": cv(f"{mb}.convflow2.0"),
            "conv": cv(f"{mb}.conv.0"),
        },
        "gru": gru,
        "flow_head": {"conv1": cv(f"{fb}.conv1"), "conv2": cv(f"{fb}.conv2")},
        "mask": {"conv1": cv("mask_predictor.convrelu.0"), "conv2": cv("mask_predictor.conv")},
    }


def params_from_torch_gma(sd: Dict[str, np.ndarray], cfg: RAFTConfig = RAFTConfig()) -> Dict:
    """Published GMA checkpoint (zacjiang/GMA, princeton-RAFT naming:
    `fnet.* cnet.* update_block.encoder/gru/flow_head/mask/aggregator
    att.to_qk`) -> pytree with the GMA attention block. Conv weights
    OIHW -> HWIO; InstanceNorm2d(affine=False) maps to identity g/b;
    BatchNorm running stats fold into a frozen affine."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}

    def cv(name):
        w = sd[f"{name}.weight"]
        return {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "b": jnp.asarray(sd.get(f"{name}.bias", np.zeros(w.shape[0], np.float32)))}

    def nrm(name, c):
        if f"{name}.running_mean" in sd:
            g = sd[f"{name}.weight"] / np.sqrt(sd[f"{name}.running_var"] + 1e-5)
            b = sd[f"{name}.bias"] - sd[f"{name}.running_mean"] * g
            return {"g": jnp.asarray(g), "b": jnp.asarray(b), "frozen": jnp.ones(())}
        if f"{name}.weight" in sd:
            return {"g": jnp.asarray(sd[f"{name}.weight"]), "b": jnp.asarray(sd[f"{name}.bias"])}
        return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}

    def enc(base, out_dim):
        d1, d2, d3 = cfg.feat_dims
        p = {"conv1": cv(f"{base}.conv1"), "norm1": nrm(f"{base}.norm1", d1),
             "conv2": cv(f"{base}.conv2"), "layer1": [], "layer2": [], "layer3": []}
        for dims, layer in zip(((d1, d1), (d1, d2), (d2, d3)), ("layer1", "layer2", "layer3")):
            ci, co = dims
            for bi in range(2):
                bbase = f"{base}.{layer}.{bi}"
                blk = {
                    "conv1": cv(f"{bbase}.conv1"), "norm1": nrm(f"{bbase}.norm1", co),
                    "conv2": cv(f"{bbase}.conv2"), "norm2": nrm(f"{bbase}.norm2", co),
                }
                if f"{bbase}.downsample.0.weight" in sd:
                    blk["down"] = cv(f"{bbase}.downsample.0")
                    blk["dnorm"] = nrm(f"{bbase}.downsample.1", co)
                p[layer].append(blk)
        return p

    ub = "update_block"
    gru = {}
    for g in ("z", "r", "q"):
        gru[f"{g}1"] = cv(f"{ub}.gru.conv{g}1")
        gru[f"{g}2"] = cv(f"{ub}.gru.conv{g}2")
    return {
        "fnet": enc("fnet", cfg.feat_out),
        "cnet": enc("cnet", cfg.hidden_dim + cfg.context_dim),
        "motion": {
            "convc1": cv(f"{ub}.encoder.convc1"), "convc2": cv(f"{ub}.encoder.convc2"),
            "convf1": cv(f"{ub}.encoder.convf1"), "convf2": cv(f"{ub}.encoder.convf2"),
            "conv": cv(f"{ub}.encoder.conv"),
        },
        "gru": gru,
        "flow_head": {"conv1": cv(f"{ub}.flow_head.conv1"), "conv2": cv(f"{ub}.flow_head.conv2")},
        "mask": {"conv1": cv(f"{ub}.mask.0"), "conv2": cv(f"{ub}.mask.2")},
        "gma": {
            "to_qk": cv("att.to_qk"),
            "to_v": cv(f"{ub}.aggregator.to_v"),
            "gamma": jnp.asarray(np.asarray(sd[f"{ub}.aggregator.gamma"], np.float32).reshape(())),
        },
    }


def raft_flow(frame1, frame2, params=None, cfg: RAFTConfig = RAFTConfig(), key=None) -> np.ndarray:
    """Single-pair convenience matching the flow-model callable
    surface (`flow/__init__.py:9-64`): (H, W, 3) [0,1] -> (H, W, 2)."""
    if params is None:
        params = init_params(key if key is not None else jax.random.PRNGKey(0), cfg)
    f1 = jnp.asarray(frame1, jnp.float32)[None]
    f2 = jnp.asarray(frame2, jnp.float32)[None]
    h, w = f1.shape[1:3]
    hp, wp = -h % 8, -w % 8
    if hp or wp:
        f1 = jnp.pad(f1, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge")
        f2 = jnp.pad(f2, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge")
    out = forward(params, f1, f2, cfg)
    return np.asarray(out[0, :h, :w])
