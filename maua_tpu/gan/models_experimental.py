"""Additional / experimental GAN architectures for the training
harness.

Rebuild of `maua/GAN/training/models/` (DCGAN G/D
`deepconvolutional.py:14-75`; experimental StyleHyperMixerFly /
optstyle with the emerging-convolution inverse). The plugin registry
in `gan/train_cli.py` exposes them like the reference's reflection
system.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- DCGAN
def _convt_init(key, k, ci, co):
    return {"w": jax.random.normal(key, (k, k, ci, co)) * 0.02, "b": jnp.zeros((co,))}


def init_dcgan_g(key, z_dim: int = 100, base: int = 64, resolution: int = 64) -> Dict:
    """DCGAN generator (`models/deepconvolutional.py:14-44`)."""
    n_up = int(math.log2(resolution // 4))
    keys = iter(jax.random.split(key, n_up + 2))
    chans = [base * 2**i for i in range(n_up, -1, -1)]
    p = {"proj": _convt_init(next(keys), 4, z_dim, chans[0]), "ups": []}
    for i in range(n_up):
        p["ups"].append(_convt_init(next(keys), 4, chans[i], chans[i + 1] if i < n_up - 1 else base))
    p["out"] = _convt_init(next(keys), 3, base, 3)
    return p


def dcgan_g(params: Dict, z: jax.Array) -> jax.Array:
    """z (B, z_dim) -> (B, R, R, 3) in [-1, 1]."""
    x = z[:, None, None, :]
    w = params["proj"]["w"]
    x = jax.lax.conv_general_dilated(
        x, w, (1, 1), padding=((3, 3), (3, 3)), lhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["proj"]["b"]
    x = jax.nn.relu(x)
    for p in params["ups"]:
        b, h, wd, c = x.shape
        x = jax.image.resize(x, (b, h * 2, wd * 2, c), "nearest")
        x = jax.lax.conv_general_dilated(
            x, p["w"], (1, 1), ((1, 2), (1, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + p["b"]
        x = jax.nn.relu(x)
    x = jax.lax.conv_general_dilated(
        x, params["out"]["w"], (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + params["out"]["b"]
    return jnp.tanh(x)


def init_dcgan_d(key, base: int = 64, resolution: int = 64) -> Dict:
    """DCGAN discriminator (`models/deepconvolutional.py:47-75`)."""
    n_down = int(math.log2(resolution // 4))
    keys = iter(jax.random.split(key, n_down + 2))
    p = {"inp": _convt_init(next(keys), 4, 3, base), "downs": []}
    ch = base
    for i in range(n_down - 1):
        p["downs"].append(_convt_init(next(keys), 4, ch, ch * 2))
        ch *= 2
    p["out"] = _convt_init(next(keys), 4, ch, 1)
    return p


def dcgan_d(params: Dict, img: jax.Array) -> jax.Array:
    conv = lambda p, x, s: jax.lax.conv_general_dilated(
        x, p["w"], (s, s), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + p["b"]
    x = jax.nn.leaky_relu(conv(params["inp"], img, 2), 0.2)
    for p in params["downs"]:
        x = jax.nn.leaky_relu(conv(p, x, 2), 0.2)
    x = conv(params["out"], x, 1)
    return x.mean(axis=(1, 2))


# -------------------------------------------- optstyle emerging convs
def masked_emerging_weight(key, channels: int, ksize: int = 3, is_upper: bool = False) -> jnp.ndarray:
    """Autoregressive masked conv weight whose inverse the native
    kernel computes (`models/experimental/optstyle/`): triangular
    center tap + one-sided spatial taps."""
    kc = (ksize - 1) // 2
    w = jax.random.normal(key, (ksize, ksize, channels, channels)) * 0.1
    spatial_mask = np.zeros((ksize, ksize, 1, 1), np.float32)
    for kk in range(ksize):
        for mm in range(ksize):
            if is_upper:
                solved = (kk < kc) or (kk == kc and mm < kc)
            else:
                solved = (kk > kc) or (kk == kc and mm > kc)
            if solved:
                spatial_mask[kk, mm] = 1.0
    center_mask = np.tril(np.ones((channels, channels)), -1) if is_upper else np.triu(np.ones((channels, channels)), 1)
    w = w * jnp.asarray(spatial_mask)
    center = jax.random.normal(jax.random.fold_in(key, 1), (channels, channels)) * 0.1
    diag = 1.0 + jax.random.uniform(jax.random.fold_in(key, 2), (channels,))
    w = w.at[kc, kc].set(center * jnp.asarray(center_mask) + jnp.diag(diag))
    return w


def emerging_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Forward masked conv (invertible; see native.inverse_conv)."""
    pad = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def emerging_conv_inverse(z, w, is_upper: bool = False):
    """Host-side exact inverse via the native C++ kernel."""
    from .. import native

    return native.inverse_conv(np.asarray(z), np.asarray(w), is_upper=is_upper)


# -------------------------------------------------- StyleHyperMixer
def init_hypermixer_g(key, z_dim: int = 64, dim: int = 128, grid: int = 8, depth: int = 4,
                      resolution: int = 32) -> Dict:
    """Compact StyleHyperMixerFly-style generator
    (`models/experimental/stylehypermixerfly.py`, 513 LoC in the
    reference): token-mixing MLPs over a latent feature grid whose
    mixing weights are HYPER-generated from the style vector, followed
    by upsampling convs to pixels."""
    keys = iter(jax.random.split(key, depth * 3 + 16))
    nk = lambda: next(keys)
    n_tok = grid * grid
    p = {
        "seed": jax.random.normal(nk(), (n_tok, dim)) * 0.1,
        "style": {"w": jax.random.normal(nk(), (z_dim, dim)) / math.sqrt(z_dim), "b": jnp.zeros((dim,))},
        "blocks": [],
    }
    for _ in range(depth):
        p["blocks"].append({
            # hypernetwork generating the token-mixing matrix from style
            "hyper": {"w": jax.random.normal(nk(), (dim, n_tok * 8)) / math.sqrt(dim), "b": jnp.zeros((n_tok * 8,))},
            "mix_proj": {"w": jax.random.normal(nk(), (8, n_tok)) / math.sqrt(8.0)},
            "channel": {"w": jax.random.normal(nk(), (dim, dim)) / math.sqrt(dim), "b": jnp.zeros((dim,))},
        })
    n_up = int(math.log2(resolution // grid))
    p["ups"] = [_convt_init(nk(), 3, dim if i == 0 else 64, 64) for i in range(n_up)]
    p["out"] = _convt_init(nk(), 3, 64 if n_up else dim, 3)
    return p


def hypermixer_g(params: Dict, z: jax.Array, grid: int = 8) -> jax.Array:
    b = z.shape[0]
    style = jnp.tanh(z @ params["style"]["w"] + params["style"]["b"])  # (B, dim)
    x = jnp.tile(params["seed"][None], (b, 1, 1)) + style[:, None, :]
    n_tok = x.shape[1]
    for blk in params["blocks"]:
        h = style @ blk["hyper"]["w"] + blk["hyper"]["b"]  # (B, n_tok*8)
        mix = jnp.tanh(h.reshape(b, n_tok, 8) @ blk["mix_proj"]["w"])  # (B, n_tok, n_tok)
        x = x + jnp.einsum("bts,bsd->btd", jax.nn.softmax(mix, -1), x)
        x = x + jax.nn.gelu(x @ blk["channel"]["w"] + blk["channel"]["b"])
    img = x.reshape(b, grid, grid, -1)
    for p in params["ups"]:
        bb, hh, ww, cc = img.shape
        img = jax.image.resize(img, (bb, hh * 2, ww * 2, cc), "nearest")
        img = jax.nn.relu(jax.lax.conv_general_dilated(
            img, p["w"], (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"])
    img = jax.lax.conv_general_dilated(
        img, params["out"]["w"], (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + params["out"]["b"]
    return jnp.tanh(img)


# ------------------------------------------------------- involution
def _inv_init(key, ci: int, co: int, groups: int, ksize: int, reduce: int = 4) -> Dict:
    """One involution layer (`models/experimental/deepinvolutional.py`
    role; the Involution2d op itself): a 1x1 channel map plus a
    per-pixel kernel-generating path (1x1 reduce -> act -> 1x1 span to
    groups*K*K spatial weights)."""
    k1, k2, k3 = jax.random.split(key, 3)
    mid = max(co // reduce, 4)
    return {
        "chan": {"w": jax.random.normal(k1, (1, 1, ci, co)) * 0.02, "b": jnp.zeros((co,))},
        "reduce": {"w": jax.random.normal(k2, (1, 1, co, mid)) * 0.02, "b": jnp.zeros((mid,))},
        "span": {"w": jax.random.normal(k3, (1, 1, mid, groups * ksize * ksize)) * 0.02,
                 "b": jnp.zeros((groups * ksize * ksize,))},
        "ln_g": jnp.ones((co,)), "ln_b": jnp.zeros((co,)),
    }


def _conv1x1(p, x, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + p["b"]


def involution2d(p: Dict, x: jax.Array, groups: int = 4, ksize: int = 3, stride: int = 1) -> jax.Array:
    """Involution: spatial mixing with kernels GENERATED per output
    pixel from the feature map (inverted conv: spatial-specific,
    channel-shared). Patches x dynamic kernels is an elementwise
    multiply-reduce (VPU), the channel maps are MXU matmuls."""
    b = x.shape[0]
    x = _conv1x1(p["chan"], x)  # channel map first (in_ch -> out_ch)
    co = x.shape[-1]
    # kernel generation on the strided grid
    h = _conv1x1(p["reduce"], x, stride=stride)
    mu = h.mean(-1, keepdims=True)
    sig = jnp.sqrt(((h - mu) ** 2).mean(-1, keepdims=True) + 1e-6)
    h = jax.nn.gelu((h - mu) / sig)
    kernels = _conv1x1(p["span"], h)  # (B, H', W', G*K*K)
    hh, ww = kernels.shape[1:3]
    kernels = kernels.reshape(b, hh, ww, groups, 1, ksize * ksize)
    # patch extraction at the same stride; feature dim is (C, kh, kw)
    pad = ksize // 2
    patches = jax.lax.conv_general_dilated_patches(
        x, (ksize, ksize), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, hh, ww, co, ksize * ksize)
    patches = patches.reshape(b, hh, ww, groups, co // groups, ksize * ksize)
    out = jnp.sum(patches * kernels, axis=-1).reshape(b, hh, ww, co)
    mu = out.mean(-1, keepdims=True)
    sig = jnp.sqrt(((out - mu) ** 2).mean(-1, keepdims=True) + 1e-6)
    return p["ln_g"] * (out - mu) / sig + p["ln_b"]


def init_involution_g(key, z_dim: int = 100, base: int = 64, resolution: int = 64) -> Dict:
    """DeepInvolutionalGenerator role (`deepinvolutional.py:16-50`):
    1x1 seed -> [involution, up x2, involution] blocks -> 3 channels."""
    nb = int(math.log2(resolution))
    chans = [min(base * 2 ** i, base * 8) for i in range(nb)][::-1]
    keys = iter(jax.random.split(key, 2 * nb + 2))
    p = {"blocks": []}
    ci = z_dim
    for i, c in enumerate(chans):
        p["blocks"].append({
            "a": _inv_init(next(keys), ci, c, groups=4, ksize=3),
            "b": _inv_init(next(keys), c, 3 if i == nb - 1 else c, groups=1 if i == nb - 1 else 4, ksize=3),
        })
        ci = 3 if i == nb - 1 else c
    return p


def involution_g(params: Dict, z: jax.Array) -> jax.Array:
    x = z[:, None, None, :]  # 1x1 spatial seed (`forward: input[..., None, None]`)
    n = len(params["blocks"])
    for i, blk in enumerate(params["blocks"]):
        x = jax.nn.gelu(involution2d(blk["a"], x, groups=4))
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
        g = 1 if i == n - 1 else 4
        x = involution2d(blk["b"], x, groups=g)
        if i < n - 1:
            x = jax.nn.gelu(x)
    return jnp.tanh(x)


def init_involution_d(key, base: int = 64, resolution: int = 64) -> Dict:
    """DeepInvolutionalDiscriminator role (`deepinvolutional.py:54-92`)."""
    nb = int(math.log2(resolution))
    chans = [min(base * 2 ** i, base * 8) for i in range(nb)]
    keys = iter(jax.random.split(key, 2 * nb + 2))
    p = {"blocks": [], "out": {"w": jax.random.normal(next(keys), (chans[-1], 1)) * 0.02, "b": jnp.zeros((1,))}}
    ci = 3
    for c in chans:
        p["blocks"].append({
            "a": _inv_init(next(keys), ci, c, groups=4, ksize=3),
            "b": _inv_init(next(keys), c, c, groups=4, ksize=3),
        })
        ci = c
    return p


def involution_d(params: Dict, img: jax.Array) -> jax.Array:
    x = img
    for blk in params["blocks"]:
        x = jax.nn.gelu(involution2d(blk["a"], x, groups=4))
        x = jax.nn.gelu(involution2d(blk["b"], x, groups=4, stride=2))
    x = x.mean(axis=(1, 2))
    return (x @ params["out"]["w"] + params["out"]["b"])[:, 0]


# ------------------------------------------- p4m group-equivariant
# Role of `models/experimental/equivariant.py` (escnn SteerableGenerator
# / SteerableDiscriminator): rotation/flip-equivariant G with an
# explicit output-rotation control and a D invariant to rotations and
# reflections. TPU-first redesign: instead of escnn's band-limited
# continuous steerable basis we use EXACT p4m (dihedral D4) group
# convolutions -- kernel orbits assembled into ONE dense conv kernel so
# the whole group dimension rides the MXU as extra channels, and the
# equivariance is exact (testable to float tolerance), not truncated
# at a maximum frequency. The continuous-rotation knob becomes a
# discrete 8-element group action (documented divergence).

_D4 = [(m, r) for m in (0, 1) for r in range(4)]  # g = flip^m . rot^r


def _d4_compose(i: int, j: int) -> int:
    (m1, r1), (m2, r2) = _D4[i], _D4[j]
    m = m1 ^ m2
    r = ((r1 if m2 == 0 else -r1) + r2) % 4
    return _D4.index((m, r))


def _d4_inverse(i: int) -> int:
    m, r = _D4[i]
    return _D4.index((m, (-(r if m == 0 else -r)) % 4))


def _d4_transform(w: jnp.ndarray, i: int) -> jnp.ndarray:
    """Spatial action of group element i on a (K, K, ...) kernel."""
    m, r = _D4[i]
    w = jnp.rot90(w, r, axes=(0, 1))
    return jnp.flip(w, axis=1) if m else w


def _lift_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(K, K, Ci, Co) -> (K, K, Ci, 8*Co): scalar field -> group field."""
    return jnp.concatenate([_d4_transform(w, g) for g in range(8)], axis=-1)


def _group_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(K, K, 8, Ci, Co) -> (K, K, 8*Ci, 8*Co) group-equivariant conv:
    output block g over input block h uses T_g(w[g^-1 h])."""
    k = w.shape[0]
    cols = []
    for g in range(8):
        blocks = [_d4_transform(w[:, :, _d4_compose(_d4_inverse(g), h)], g) for h in range(8)]
        cols.append(jnp.concatenate(blocks, axis=2))  # stack input groups on Ci
    return jnp.concatenate(cols, axis=-1).reshape(k, k, -1, 8 * w.shape[-1])


def _gconv(x, kern, stride=1):
    pad = kern.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, kern, (stride, stride), ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _gnorm(x, g, b):
    """Positionwise LN over the full (group x channel) feature vector —
    commutes with the D4 action, so equivariance is preserved."""
    mu = x.mean(-1, keepdims=True)
    sig = jnp.sqrt(((x - mu) ** 2).mean(-1, keepdims=True) + 1e-6)
    return g * (x - mu) / sig + b


def init_steerable_g(key, z_dim: int = 128, base: int = 16, resolution: int = 32, depth: int = 4) -> Dict:
    keys = iter(jax.random.split(key, depth + 4))
    nk = lambda: next(keys)
    p = {
        "map": {"w": jax.random.normal(nk(), (z_dim, z_dim)) / math.sqrt(z_dim), "b": jnp.zeros((z_dim,))},
        "lift": jax.random.normal(nk(), (3, 3, z_dim, base)) * 0.1,
        "blocks": [],
        "out": jax.random.normal(nk(), (3, 3, 8, base, 3)) * 0.1,
    }
    for _ in range(depth):
        p["blocks"].append({
            "w": jax.random.normal(nk(), (3, 3, 8, base, base)) * 0.1,
            "g": jnp.ones((8 * base,)), "b": jnp.zeros((8 * base,)),
        })
    return p


def steerable_g(params: Dict, z: jax.Array, rotation: int = 0, flip: bool = False) -> jax.Array:
    """z (B, z_dim) -> (B, R, R, 3). `rotation` (0-3 quarter turns) and
    `flip` pick the D4 element applied to the output field: the
    ExtractRotation role. Exact: steerable_g(z, r) equals
    rot90^r(steerable_g(z, 0)) to float tolerance."""
    w = jnp.tanh(z @ params["map"]["w"] + params["map"]["b"])
    b = w.shape[0]
    x = jnp.tile(w[:, None, None, :], (1, 4, 4, 1))  # invariant seed field
    x = _gconv(x, _lift_kernel(params["lift"]))
    depth = len(params["blocks"])
    for i, blk in enumerate(params["blocks"]):
        x = jax.nn.gelu(_gnorm(_gconv(x, _group_kernel(blk["w"])), blk["g"], blk["b"]))
        if i < depth and x.shape[1] * 2 <= 4 * 2 ** depth:
            bb, hh, ww, cc = x.shape
            x = jax.image.resize(x, (bb, hh * 2, ww * 2, cc), "bilinear")
    x = _gconv(x, _group_kernel(params["out"]))  # (B, R, R, 8*3)
    gi = _D4.index((int(flip), rotation % 4))
    return x.reshape(b, x.shape[1], x.shape[2], 8, 3)[:, :, :, gi]


def init_steerable_d(key, base: int = 16, resolution: int = 32, depth: int = 4) -> Dict:
    keys = iter(jax.random.split(key, depth + 4))
    nk = lambda: next(keys)
    p = {
        "lift": jax.random.normal(nk(), (3, 3, 3, base)) * 0.1,
        "blocks": [],
        "head": {"w": jax.random.normal(nk(), (base, 1)) * 0.1, "b": jnp.zeros((1,))},
    }
    for _ in range(depth):
        p["blocks"].append({
            "w": jax.random.normal(nk(), (3, 3, 8, base, base)) * 0.1,
            "g": jnp.ones((8 * base,)), "b": jnp.zeros((8 * base,)),
        })
    return p


def steerable_d(params: Dict, img: jax.Array) -> jax.Array:
    """Rotation/reflection-invariant discriminator: group conv stack,
    then group-mean + spatial-mean pooling (both D4-invariant).
    Downsampling is a symmetric 2x2 average pool, NOT a strided conv:
    a stride-2 SAME conv anchors at even pixels, and rot90 of an
    even-sized grid maps those anchors to odd pixels — breaking
    invariance. The partitioning 2x2 pool's windows permute under the
    group action, so it commutes exactly."""
    x = _gconv(img, _lift_kernel(params["lift"]))
    for blk in params["blocks"]:
        x = jax.nn.gelu(_gnorm(_gconv(x, _group_kernel(blk["w"])), blk["g"], blk["b"]))
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) * 0.25
    b = x.shape[0]
    x = x.reshape(b, x.shape[1], x.shape[2], 8, -1).mean(axis=(1, 2, 3))  # invariant pool
    return (x @ params["head"]["w"] + params["head"]["b"])[:, 0]
