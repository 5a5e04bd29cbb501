"""RRDBNet (Real-ESRGAN generator) + SRVGG compact net, functional JAX.

Rebuild of the architectures behind
`maua/super/image/models/realesrgan.py:13-49` (the basicsr RRDBNet /
SRVGGNetCompact reached through the stripped RealESRGAN submodule):
residual-in-residual dense blocks, pixel-unshuffle-free x4 upsampling
via two nearest-neighbor stages. Weight conversion from basicsr state
dicts; random init for offline tests.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RRDBConfig:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4
    dtype: str = "float32"


def _conv_init(key, ci, co, k=3, scale=1.0):
    s = scale / math.sqrt(ci * k * k)
    return {
        "w": jax.random.normal(key, (k, k, ci, co)) * s,
        "b": jnp.zeros((co,)),
    }


def conv(p, x, padding=1):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)


def _init_rdb(key, nf, gc):
    ks = jax.random.split(key, 5)
    return {f"conv{i + 1}": _conv_init(ks[i], nf + i * gc, gc if i < 4 else nf, scale=0.1) for i in range(5)}


def _rdb_partial(p, x):
    """Residual dense block as stage-wise partial convs summed (exact
    by linearity: conv(concat[a, b], W) = conv(a, W[:ca]) + conv(b,
    W[ca:])) — the concat tensors (96..192 channels at full resolution,
    ~600 MB HBM writes+reads per RDB at 256^2 batch 8) never
    materialize. Kept for measurement (MAUA_RRDB_MODE=partial); every
    conv here has Co=32, a 25% fill of the 128-lane MXU output tile."""
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    feats = [x]
    for i in range(1, 6):
        w, b = p[f"conv{i}"]["w"], p[f"conv{i}"]["b"]
        off, acc = 0, None
        for t in feats:
            c = t.shape[-1]
            y = jax.lax.conv_general_dilated(
                t, w[:, :, off : off + c].astype(t.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = y if acc is None else acc + y
            off += c
        acc = acc + b.astype(acc.dtype)
        if i < 5:
            feats.append(lrelu(acc))
    return acc * 0.2 + x


def _rdb_concat(p, x):
    """Reference formulation: each stage convolves its materialized
    growing concat (what basicsr runs). Measurement baseline
    (MAUA_RRDB_MODE=concat)."""
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    feats = [x]
    for i in range(1, 6):
        acc = conv(p[f"conv{i}"], jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0])
        if i < 5:
            feats.append(lrelu(acc))
    return acc * 0.2 + x


def _rdb(p, x):
    """Residual dense block, INPUT-grouped partial convs (default).

    Same linearity identity as `_rdb_partial`, regrouped by which
    tensor feeds each partial: once feats[i] exists, ALL five stages'
    slices of weights that consume it fuse into ONE conv whose output
    channels stack the consuming stages. Stage outputs then assemble as
    slice-sums. This fixes the MXU geometry that caps the stage-wise
    forms: every conv's Co was 32 (25% of the 128-lane output tile,
    16.6% MFU measured round 4); grouped, Co runs 192/160/128/96/64 —
    a FLOP-weighted 93% output-lane fill — and each feats[i] is read
    from HBM once instead of (5-i) times. Exact to the usual bf16
    partial-sum roundoff (tests pin grouped == concat in f32)."""
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    widths = [p[f"conv{j}"]["w"].shape[-1] for j in range(1, 6)]  # 32,32,32,32,nf
    feats = [x]
    partial = [None] * 5
    acc = None
    for i in range(5):  # i = input index; feats[i] just became available
        f = feats[i]
        ci = f.shape[-1]
        off = 0 if i == 0 else feats[0].shape[-1] + (i - 1) * widths[0]
        wcat = jnp.concatenate(
            [p[f"conv{j + 1}"]["w"][:, :, off : off + ci, :] for j in range(i, 5)], axis=-1)
        y = jax.lax.conv_general_dilated(
            f, wcat.astype(f.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        o = 0
        for j in range(i, 5):
            part = y[..., o : o + widths[j]]
            partial[j] = part if partial[j] is None else partial[j] + part
            o += widths[j]
        # stage i+1 has now received every input it consumes
        acc = partial[i] + p[f"conv{i + 1}"]["b"].astype(y.dtype)
        if i < 4:
            feats.append(lrelu(acc))
    return acc * 0.2 + x


def _rdb_paired(p, x):
    """Residual dense block with BOTH matmul dims packed.

    The input-grouped form (`_rdb`) fixes output-lane fill (Co
    192..64) but still feeds the MXU Ci=32 tensors for 54% of the
    FLOPs. Deferring each f_i's partials until its successor exists
    lets them batch pairwise — conv(concat[f1,f2], W) for stages 3-5,
    conv(concat[f3,f4], W) for stage 5 — while the only partials that
    cannot wait (f1->stage2, f3->stage4) stay as small 32x32 convs:
    92% of the FLOPs then run with Ci=64 AND Co>=64 (measured:
    concat 14.0 -> grouped 17.9 -> paired, see PERFORMANCE.md).
    Exact regrouping of the same linear map (conv over a concat equals
    the sum of partial convs)."""
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    cv = lambda t, wk: jax.lax.conv_general_dilated(
        t, wk.astype(t.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w = lambda j, off, ci: p[f"conv{j}"]["w"][:, :, off : off + ci, :]
    b = lambda j, ref: p[f"conv{j}"]["b"].astype(ref.dtype)
    c0 = x.shape[-1]
    widths = [p[f"conv{j}"]["w"].shape[-1] for j in range(1, 6)]
    cuts = np.cumsum(widths)[:-1]
    a1, a2, a3, a4, a5 = jnp.split(
        cv(x, jnp.concatenate([w(j, 0, c0) for j in range(1, 6)], axis=-1)), cuts, axis=-1)
    f1 = lrelu(a1 + b(1, a1))
    g = widths[0]  # grow channels (f1..f4 width)
    f2 = lrelu(a2 + cv(f1, w(2, c0, g)) + b(2, a2))
    c3, c4, c5 = jnp.split(
        cv(jnp.concatenate([f1, f2], axis=-1),
           jnp.concatenate([w(j, c0, 2 * g) for j in (3, 4, 5)], axis=-1)),
        np.cumsum(widths[2:4]), axis=-1)
    f3 = lrelu(a3 + c3 + b(3, a3))
    f4 = lrelu(a4 + c4 + cv(f3, w(4, c0 + 2 * g, g)) + b(4, a4))
    out = a5 + c5 + cv(jnp.concatenate([f3, f4], axis=-1), w(5, c0 + 2 * g, 2 * g)) + b(5, a5)
    return out * 0.2 + x


_RDB_MODES = {"grouped": _rdb, "partial": _rdb_partial, "concat": _rdb_concat,
              "paired": _rdb_paired}


def _rdb_fn():
    import os

    return _RDB_MODES[os.environ.get("MAUA_RRDB_MODE", "grouped")]


def _init_rrdb(key, nf, gc):
    ks = jax.random.split(key, 3)
    return {f"rdb{i + 1}": _init_rdb(ks[i], nf, gc) for i in range(3)}


def _rrdb(p, x):
    rdb = _rdb_fn()
    out = rdb(p["rdb1"], x)
    out = rdb(p["rdb2"], out)
    out = rdb(p["rdb3"], out)
    return out * 0.2 + x


def init_params(key, cfg: RRDBConfig = RRDBConfig()) -> Dict:
    keys = iter(jax.random.split(key, cfg.num_block + 8))
    nk = lambda: next(keys)
    nf, gc = cfg.num_feat, cfg.num_grow_ch
    return {
        "conv_first": _conv_init(nk(), cfg.num_in_ch, nf),
        "body": [_init_rrdb(nk(), nf, gc) for _ in range(cfg.num_block)],
        "conv_body": _conv_init(nk(), nf, nf),
        "conv_up1": _conv_init(nk(), nf, nf),
        "conv_up2": _conv_init(nk(), nf, nf),
        "conv_hr": _conv_init(nk(), nf, nf),
        "conv_last": _conv_init(nk(), nf, cfg.num_out_ch),
    }


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


def _fold_up2_conv(p, x):
    """nearest-2x upsample + 3x3 SAME conv, folded into one 2x2 conv
    producing the four output phases on the SMALL grid + depth-to-space.

    Output pixel (2i+a, 2j+b) of conv(up2(x)) taps up2 rows
    2i+a-1 .. 2i+a+1, which collapse onto TWO source rows
    (i + floor((a+dy-1)/2)) with summed weights — so each phase is an
    exact 2x2 kernel: 16 vs 36 ci*co MACs per source pixel (2.25x) and
    the 2x-resized tensor never materializes (measured at 1024^2 b8:
    resize+conv 28.8 ms, the resize alone ~12 ms of it). Border-exact:
    the (1,1) source zero-pad reproduces SAME padding on the doubled
    grid because both doubled rows of a source row share its value."""
    w, b = p["w"], p["b"]
    ci, co = w.shape[2], w.shape[3]
    ks = []
    for a in range(2):
        for bb in range(2):
            k = jnp.zeros((2, 2, ci, co), w.dtype)
            for dy in range(3):
                # tap dy of phase a reads source row i + (a+dy-1)//2;
                # the sliced y-window for phase a starts at source row
                # i-1+a, so the 2x2 kernel row is the difference
                ty = (a + dy - 1) // 2 + 1 - a
                for dx in range(3):
                    tx = (bb + dx - 1) // 2 + 1 - bb
                    k = k.at[ty, tx].add(w[dy, dx])
            ks.append(k)
    kall = jnp.concatenate(ks, axis=-1)  # (2, 2, ci, 4co)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kall.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, h1, w1, _ = y.shape
    h, wd = h1 - 1, w1 - 1
    ph = [y[:, a : h + a, bb : wd + bb, (a * 2 + bb) * co : (a * 2 + bb + 1) * co]
          for a in range(2) for bb in range(2)]
    stacked = jnp.stack([jnp.stack(ph[0:2], axis=3), jnp.stack(ph[2:4], axis=3)], axis=2)
    return stacked.reshape(B, 2 * h, 2 * wd, co) + b.astype(y.dtype)


def _up2_conv(p, x):
    import os

    # measured e2e-NEUTRAL on the full net (17.9 vs 17.8 img/s): the
    # 2.25x MAC saving is real but the depth-to-space relayout gives it
    # back at these shapes — kept as an exact opt-in (the judge-by-e2e
    # discipline, PERFORMANCE.md)
    if os.environ.get("MAUA_RRDB_FOLDUP", "0") == "1":
        return _fold_up2_conv(p, x)
    return conv(p, _up2(x))


def forward(params: Dict, img: jax.Array, cfg: RRDBConfig = RRDBConfig()) -> jax.Array:
    """img (B, H, W, C) in [0, 1] -> (B, scale*H, scale*W, C)."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    x = img.astype(dtype)
    feat = conv(params["conv_first"], x)
    body = feat
    for blk in params["body"]:
        body = _rrdb(blk, body)
    feat = feat + conv(params["conv_body"], body)
    feat = lrelu(_up2_conv(params["conv_up1"], feat))
    if cfg.scale >= 4:
        feat = lrelu(_up2_conv(params["conv_up2"], feat))
    out = conv(params["conv_last"], lrelu(conv(params["conv_hr"], feat)))
    return out.astype(jnp.float32)


def params_from_torch(sd: Dict[str, np.ndarray], cfg: RRDBConfig = RRDBConfig()) -> Dict:
    """basicsr RRDBNet state dict (params/params_ema containers
    handled by caller) -> pytree."""

    def cv(name):
        return {
            "w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))),
            "b": jnp.asarray(sd[f"{name}.bias"]),
        }

    body = []
    for b in range(cfg.num_block):
        blk = {}
        for r in range(1, 4):
            blk[f"rdb{r}"] = {f"conv{c}": cv(f"body.{b}.rdb{r}.conv{c}") for c in range(1, 6)}
        body.append(blk)
    return {
        "conv_first": cv("conv_first"),
        "body": body,
        "conv_body": cv("conv_body"),
        "conv_up1": cv("conv_up1"),
        "conv_up2": cv("conv_up2"),
        "conv_hr": cv("conv_hr"),
        "conv_last": cv("conv_last"),
    }


# --------------------------------------------------------- SRVGG compact
@dataclasses.dataclass(frozen=True)
class SRVGGConfig:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4


def init_srvgg_params(key, cfg: SRVGGConfig = SRVGGConfig()) -> Dict:
    keys = iter(jax.random.split(key, cfg.num_conv + 4))
    nk = lambda: next(keys)
    p = {"convs": [_conv_init(nk(), cfg.num_in_ch, cfg.num_feat)]}
    p["prelu"] = [jnp.full((cfg.num_feat,), 0.25)]
    for _ in range(cfg.num_conv):
        p["convs"].append(_conv_init(nk(), cfg.num_feat, cfg.num_feat))
        p["prelu"].append(jnp.full((cfg.num_feat,), 0.25))
    p["conv_last"] = _conv_init(nk(), cfg.num_feat, cfg.num_out_ch * cfg.upscale**2)
    return p


def srvgg_forward(params: Dict, img: jax.Array, cfg: SRVGGConfig = SRVGGConfig()) -> jax.Array:
    x = img
    for p, a in zip(params["convs"], params["prelu"]):
        x = conv(p, x)
        x = jnp.where(x >= 0, x, a.astype(x.dtype) * x)
    x = conv(params["conv_last"], x)
    # pixel shuffle (depth-to-space)
    b, h, w, c = x.shape
    r = cfg.upscale
    x = x.reshape(b, h, w, cfg.num_out_ch, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * r, w * r, cfg.num_out_ch)
    base = jax.image.resize(img, (b, h * r, w * r, img.shape[-1]), method="nearest")
    return x + base


def srvgg_params_from_torch(sd: Dict[str, np.ndarray], cfg: SRVGGConfig = SRVGGConfig()) -> Dict:
    """realesrgan SRVGGNetCompact state dict -> pytree. The torch body
    is a flat Sequential of alternating conv/prelu with a final conv
    (to out_ch * scale^2) before the parameter-free pixel shuffle."""
    idxs = sorted({int(k.split(".")[1]) for k in sd if k.startswith("body.")})
    convs, prelus = [], []
    last = None
    for i in idxs:
        w = sd[f"body.{i}.weight"]
        if w.ndim == 4:
            entry = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(sd[f"body.{i}.bias"])}
            last = entry
            convs.append(entry)
        else:  # prelu slope
            prelus.append(jnp.asarray(w))
    convs = convs[:-1]  # final conv is conv_last, not part of the pairs
    if len(convs) != len(prelus):
        raise ValueError(f"unexpected SRVGG body layout: {len(convs)} convs vs {len(prelus)} prelus")
    return {"convs": convs, "prelu": prelus, "conv_last": last}
