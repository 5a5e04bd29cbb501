"""Image tensor ops: tiling with blended seams, resampling, color
matching, sharpening.

TPU-native rebuild of `maua/ops/image.py` (destitch/restitch :15-62,
match_histogram :113-173, lanczos resample :214-240, sharpen :70-71,
original_colors :84-90). Canonical layout here is NHWC (TPU-preferred);
values in [-1, 1] unless noted.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _comb(n, k):
    return math.comb(int(n), int(k))


def smoothstep(x: jax.Array, N: int = 2) -> jax.Array:
    """Generalized smoothstep polynomial (`maua/ops/image.py:26-31`)."""
    result = jnp.zeros_like(x)
    for n in range(0, N + 1):
        result += _comb(N + n, n) * _comb(2 * N + 1, N - n) * (-x) ** n
    return result * x ** (N + 1)


def blend_weight1d(total_size: int, fade_in: int, fade_out: int) -> jax.Array:
    """1-D fade-in/out blend profile (`maua/ops/image.py:34-41`)."""
    parts = []
    if fade_in > 0:
        parts.append(smoothstep(jnp.linspace(0, 1, fade_in)))
    parts.append(jnp.ones(total_size - fade_in - fade_out))
    if fade_out > 0:
        parts.append(smoothstep(jnp.linspace(1, 0, fade_out)))
    return jnp.concatenate(parts)


def _tile_grid(H: int, W: int, tile_size: int, overtile: int):
    n_rows = int(round(np.floor(H / tile_size) + overtile))
    n_cols = int(round(np.floor(W / tile_size) + overtile))
    ys = np.round(np.linspace(0, H - tile_size, n_rows)).astype(int)
    xs = np.round(np.linspace(0, W - tile_size, n_cols)).astype(int)
    return ys, xs


def destitch(img: jax.Array, tile_size: int, overtile: int = 1) -> jax.Array:
    """Split (1,H,W,C) into overlapping (N,tile,tile,C) tiles
    (`maua/ops/image.py:15-23`)."""
    _, H, W, _ = img.shape
    ys, xs = _tile_grid(H, W, tile_size, overtile)
    tiles = [img[:, y : y + tile_size, x : x + tile_size, :] for y in ys for x in xs]
    return jnp.concatenate(tiles, axis=0)


def restitch(tiled: jax.Array, H: int, W: int, overtile: int = 1) -> jax.Array:
    """Blend overlapping tiles back to (1,H,W,C) with smoothstep seams
    (`maua/ops/image.py:44-62`)."""
    n, tile_size, _, C = tiled.shape
    ys, xs = _tile_grid(H, W, tile_size, overtile)
    out = jnp.zeros((1, H, W, C), tiled.dtype)
    rescale = jnp.zeros((1, H, W, 1), tiled.dtype)
    fade = int(tile_size - ys[1]) if len(ys) > 1 else 0
    i = 0
    for y in ys:
        wy = blend_weight1d(tile_size, 0 if y == ys[0] else fade, 0 if y == ys[-1] else fade)
        for x in xs:
            wx = blend_weight1d(tile_size, 0 if x == xs[0] else fade, 0 if x == xs[-1] else fade)
            w = (wy[:, None] * wx[None, :])[None, :, :, None].astype(tiled.dtype)
            out = out.at[:, y : y + tile_size, x : x + tile_size, :].add(tiled[i] * w)
            rescale = rescale.at[:, y : y + tile_size, x : x + tile_size, :].add(w)
            i += 1
    return out / rescale


def scaled_height_width(h: int, w: int, size: int):
    """Short-side scaling to even dims (`maua/ops/image.py:461-466`)."""
    short, long = (w, h) if w <= h else (h, w)
    new_short, new_long = size, int(size * long / short)
    w, h = (new_short, new_long) if w <= h else (new_long, new_short)
    return math.ceil(h / 2.0) * 2, math.ceil(w / 2.0) * 2


def resample(img: jax.Array, size, method: str = "lanczos3") -> jax.Array:
    """High-quality anti-aliased resize of NHWC images.

    Equivalent of the reference's lanczos-prefilter + bicubic
    interpolate (`maua/ops/image.py:214-240`); jax.image.resize with a
    lanczos3 kernel performs the same anti-aliased resampling in one
    fused XLA op. `size` is (H, W) or an int (short side).
    """
    n, h, w, c = img.shape
    if isinstance(size, (int, float)):
        dh, dw = scaled_height_width(h, w, int(size))
    else:
        dh, dw = size
    return jax.image.resize(img, (n, dh, dw, c), method=method, antialias=True)


def sharpen(img: jax.Array, strength: float) -> jax.Array:
    """Unsharp blend in [0,1] space, NHWC, matching torchvision
    adjust_sharpness semantics used at `maua/ops/image.py:70-71`."""
    x = (img + 1.0) / 2.0
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    c = x.shape[-1]
    rhs = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    blurred = jax.lax.conv_general_dilated(
        x, rhs, (1, 1), padding="SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # torchvision keeps the 1px border unsharpened
    mask = jnp.zeros_like(x).at[:, 1:-1, 1:-1, :].set(1.0)
    out = jnp.where(mask > 0, jnp.clip(strength * x + (1 - strength) * blurred, 0, 1), x)
    return out * 2.0 - 1.0


def luminance(x: jax.Array) -> jax.Array:
    """Rec.709 luma of an NHWC image (`maua/ops/image.py:310-311`)."""
    return 0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]


# numpy at module scope: a jnp constant here would dispatch a device
# op at import time (forcing backend init before the CLI even parses
# --help); functions convert lazily
_RGB2YCBCR = np.array(
    [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]], np.float32
)


def rgb_to_ycbcr(x: jax.Array) -> jax.Array:
    ycc = jnp.einsum("...c,kc->...k", x, jnp.asarray(_RGB2YCBCR), precision="highest")
    return ycc.at[..., 1:].add(0.5)


_YCBCR2RGB = np.linalg.inv(np.array(
    [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]], np.float64
)).astype(np.float32)


def ycbcr_to_rgb(x: jax.Array) -> jax.Array:
    x = x.at[..., 1:].add(-0.5)
    return jnp.einsum("...c,kc->...k", x, jnp.asarray(_YCBCR2RGB), precision="highest")


def original_colors(content: jax.Array, generated: jax.Array) -> jax.Array:
    """Keep generated luma, restore content chroma
    (`maua/ops/image.py:84-90`). Both NHWC in [0,1]."""
    if content.shape != generated.shape:
        content = resample(content, generated.shape[1:3])
    c_ycc = rgb_to_ycbcr(content)
    g_ycc = rgb_to_ycbcr(generated)
    merged = jnp.concatenate([g_ycc[..., :1], c_ycc[..., 1:]], axis=-1)
    return jnp.clip(ycbcr_to_rgb(merged), 0.0, 1.0)


def _covariance(flat: jax.Array) -> jax.Array:
    # flat: (C, N) mean-centered
    c = flat.shape[0]
    return flat @ flat.T / flat.shape[1] + jnp.finfo(flat.dtype).eps * jnp.eye(c, dtype=flat.dtype)


def _sqrtm_psd(C: jax.Array) -> jax.Array:
    eva, eve = jnp.linalg.eigh(C)
    E = jnp.sqrt(jnp.clip(eva, 0.0, None))
    E = jnp.where(jnp.isnan(E), 0.0, E)
    return (eve * E[None, :]) @ eve.T


@partial(jax.jit, static_argnames=("elementwise",))
def _match_histogram_one(target: jax.Array, source: jax.Array, key, elementwise: bool = True) -> jax.Array:
    """PCA color-transfer core (`maua/ops/image.py:107-173`).

    target: (B,H,W,C), source: (1,H',W',C) already frame-reduced.
    """
    k1, k2 = jax.random.split(key)
    src = source + 1e-3 * jax.random.normal(k2, source.shape, source.dtype)
    mu_s = src.mean(axis=(0, 1, 2))
    s_flat = (src - mu_s).reshape(-1, src.shape[-1]).T
    Qs = _sqrtm_psd(_covariance(s_flat))

    def match_frame(frame, key):
        f = frame[None] + 1e-3 * jax.random.normal(key, (1,) + frame.shape, frame.dtype)
        mu_t = f.mean(axis=(0, 1, 2))
        t_flat = (f - mu_t).reshape(-1, f.shape[-1]).T
        Qt = _sqrtm_psd(_covariance(t_flat))
        ts = Qs @ jnp.linalg.inv(Qt) @ t_flat
        return ts.T.reshape(frame.shape) + mu_s

    if elementwise:
        keys = jax.random.split(k1, target.shape[0])
        return jax.vmap(match_frame)(target, keys)
    return match_frame(target.reshape(-1, *target.shape[2:]), k1)[None].reshape(target.shape)


def match_histogram(target: jax.Array, source, mode: str = "avg", key=None) -> jax.Array:
    """Match target's per-channel color statistics to source via PCA
    whitening/coloring (`maua/ops/image.py:113-173`).

    mode="avg": per-frame matching against the mean source frame;
    mode="random"/anything else: match all frames against one random
    source frame; mode="False": no-op.
    """
    if mode == "False" or mode is False:
        return target
    if key is None:
        key = jax.random.PRNGKey(0)
    sources = source if isinstance(source, (list, tuple)) else [source]
    out = jnp.zeros_like(target)
    lo = min(float(jnp.min(s)) for s in sources)
    hi = max(float(jnp.max(s)) for s in sources)
    for i, src in enumerate(sources):
        sk = jax.random.fold_in(key, i)
        if mode == "avg":
            src_red = src.mean(axis=0, keepdims=True)
            out = out + _match_histogram_one(target, src_red, sk, elementwise=True) / len(sources)
        else:
            idx = int(jax.random.randint(sk, (), 0, src.shape[0]))
            out = out + _match_histogram_one(target, src[idx : idx + 1], sk, elementwise=False) / len(sources)
    return jnp.clip(out, lo, hi)


def local_std(im: jax.Array, ks: int = 9) -> jax.Array:
    """Windowed standard deviation, NHWC (`maua/ops/image.py:77-84`)."""
    r = ks // 2
    x = jnp.pad(im, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
    c = im.shape[-1]
    ones = jnp.ones((ks, ks, c, 1), im.dtype)
    conv = lambda v: jax.lax.conv_general_dilated(
        v, ones, (1, 1), padding="VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).sum(axis=-1, keepdims=True)
    s = conv(x)
    s2 = conv(x * x)
    ns = conv(jnp.ones_like(x))
    return jnp.sqrt(jnp.clip((s2 - s**2 / ns) / ns, 0.0, None))


def wrapping_slice(tensor: jax.Array, start: int, length: int) -> jax.Array:
    """Circular slice along axis 0 (`maua/ops/image.py:93-101`)."""
    idx = (jnp.arange(length) + start) % tensor.shape[0]
    if tensor.shape[0] == 1:
        idx = jnp.zeros(1, jnp.int32)
    return tensor[idx]


def immerkaer(image_batch: jax.Array) -> jax.Array:
    """Immerkaer fast noise-variance estimation per image
    (`maua/ops/image.py:65-67`): sigma = sqrt(pi/2) / (6 (W-2)(H-2))
    * sum |I * L| with L the 3x3 noise-sensitive Laplacian. Jittable;
    input (B, H, W, C) in any range."""
    x = luminance(image_batch) if image_batch.shape[-1] == 3 else image_batch[..., 0]
    L = jnp.asarray([[1.0, -2.0, 1.0], [-2.0, 4.0, -2.0], [1.0, -2.0, 1.0]])
    conv = jax.lax.conv_general_dilated(
        x[:, None], L[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    h, w = x.shape[1], x.shape[2]
    return jnp.sqrt(jnp.pi / 2.0) * jnp.sum(jnp.abs(conv), axis=(1, 2)) / (6.0 * (w - 2) * (h - 2))


def _gaussian_kernel1d(ks: int, sigma: float) -> jax.Array:
    r = (ks - 1) / 2.0
    x = jnp.arange(ks) - r
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jax.Array, ks=(7, 7), sigma: float = 1.0) -> jax.Array:
    """Separable gaussian blur of (B, H, W, C), reflect-padded (the
    cv2.GaussianBlur role in `maua/ops/image.py:243-244`)."""
    kh = _gaussian_kernel1d(ks[0], sigma)
    kw = _gaussian_kernel1d(ks[1], sigma)
    b, h, w, c = img.shape
    x = jnp.transpose(img, (0, 3, 1, 2)).reshape(b * c, 1, h, w)
    rh, rw = ks[0] // 2, ks[1] // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (rh, rh), (rw, rw)), mode="reflect")
    x = jax.lax.conv_general_dilated(x, kh[None, None, :, None], (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kw[None, None, None, :], (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.transpose(x.reshape(b, c, h, w), (0, 2, 3, 1))


def unsharp_mask(img: jax.Array, ks=(7, 7), sigma: float = 1.0, amount: float = 1.0,
                 thresh: float = 0.25) -> jax.Array:
    """Unsharp masking with a low-contrast mask (`maua/ops/image.py:243-253`).
    Input (B, H, W, C) uint8-range [0, 255]; returns the same range,
    rounded, with pixels whose |img - blur| < thresh left untouched."""
    img = jnp.asarray(img, jnp.float32)
    blurred = gaussian_blur(img, ks, sigma)
    sharpened = (amount + 1.0) * img - amount * blurred
    sharpened = jnp.round(jnp.clip(sharpened, 0.0, 255.0))
    if thresh > 0:
        sharpened = jnp.where(jnp.abs(img - blurred) < thresh, img, sharpened)
    return sharpened


def color_balance(img: jax.Array, percent: float) -> jax.Array:
    """Simplest color balance (`maua/ops/image.py:180-191`): clip each
    channel at the percent/2 low/high cumulative-histogram cuts and
    rescale to [0, 255]. Input (H, W, 3) uint8-range; jittable (exact
    per-channel quantiles instead of a 256-bin LUT)."""
    img = jnp.asarray(img, jnp.float32)
    lo = jnp.quantile(img, percent / 200.0, axis=(0, 1))
    hi = jnp.quantile(img, 1.0 - percent / 200.0, axis=(0, 1))
    out = (img - lo) / jnp.maximum(hi - lo, 1e-8) * 255.0
    return jnp.round(jnp.clip(out, 0.0, 255.0))


def positive(x: jax.Array) -> jax.Array:
    """(`maua/ops/image.py:262-263`)"""
    return (x > 0).astype(jnp.float32)


def normalize_minmax(img: jax.Array) -> jax.Array:
    """Min-max normalize to [0, 1] (`maua/ops/image.py:255-259`
    normalize_np)."""
    img = jnp.asarray(img, jnp.float32)
    return (img - jnp.min(img)) / jnp.maximum(jnp.max(img) - jnp.min(img), 1e-12)


def _box_sum(x: jax.Array, ks: int) -> jax.Array:
    """The reference's integral-image window sum (`maua/ops/image.py:305-320`)
    as one conv: replicate pad radius (ks-1)//2, then — exactly like the
    reference's `integral[ks-1:-1] - integral[0:h] ...` slices — sum a
    (ks-1) x (ks-1) window offset one short of centered."""
    n = ks - 1
    r = (ks - 1) // 2
    p = jnp.pad(x, ((r, n - 1 - r), (r, n - 1 - r)), mode="edge")
    k = jnp.ones((1, 1, n, n), x.dtype)
    return jax.lax.conv_general_dilated(p[None, None], k, (1, 1), "VALID",
                                        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]


def blurriness_lbp(im_gray: jax.Array, ks: int, thresh: float) -> jax.Array:
    """Local-binary-pattern sharpness map (`maua/ops/image.py:266-322`):
    8-neighbor LBP codes (diagonals bilinearly interpolated at radius
    sqrt(2)/2), non-uniform patterns (U > 2) mapped to 9, sharpness =
    windowed density of codes {6,7,8,9}. Jittable; (H, W) in, (H, W)
    out. The reference's integral-image window sum is a box conv here
    (same values, MXU-friendly)."""
    I = normalize_minmax(im_gray)
    pt = jnp.pad(I, 1, mode="edge")

    right, left = pt[1:-1, 2:], pt[1:-1, :-2]
    above, below = pt[:-2, 1:-1], pt[2:, 1:-1]
    above_right, above_left = pt[:-2, 2:], pt[:-2, :-2]
    below_right, below_left = pt[2:, 2:], pt[2:, :-2]

    q = math.sqrt(2) / 2
    interp1 = (1 - q) * ((1 - q) * I + q * right) + q * ((1 - q) * above + q * above_right)
    interp3 = (1 - q) * ((1 - q) * I + q * left) + q * ((1 - q) * above + q * above_left)
    interp5 = (1 - q) * ((1 - q) * I + q * left) + q * ((1 - q) * below + q * below_left)
    interp7 = (1 - q) * ((1 - q) * I + q * right) + q * ((1 - q) * below + q * below_right)

    s = [positive(nb - I - thresh) for nb in
         (right, interp1, above, interp3, left, interp5, below, interp7)]
    U = sum(jnp.abs(s[(i + 1) % 8] - s[i]) for i in range(8))
    lbpmap = sum(s)
    lbpmap = jnp.where(U > 2, 9.0, lbpmap)

    sharp = (lbpmap >= 6).astype(jnp.float32)
    return _box_sum(sharp, ks) / float(ks) ** 2


def blurriness_svd(img: jax.Array, kr: int = 10, sv_num: int = 3) -> jax.Array:
    """Windowed-SVD blur map (`maua/ops/image.py:340-358`): per-pixel
    2kr x 2kr patch singular-value concentration (top sv_num / total),
    min-max inverted to a [0, 1] blur map. (H, W) in, (H, W) out.

    The reference gathers h*w index windows (`windowed_index` :325-337);
    here patches come from one strided slide + reshape and the batched
    SVD runs as singular values only."""
    h, w = img.shape
    x = jnp.pad(jnp.asarray(img, jnp.float32), kr, mode="reflect")
    ks = kr * 2
    patches = jnp.stack([x[y : y + h, xx : xx + w] for y in range(ks) for xx in range(ks)], axis=-1)
    blocks = patches.reshape(h * w, ks, ks)
    sv = jnp.linalg.svd(blocks, compute_uv=False)
    sv_degrees = jnp.sum(sv[:, :sv_num], axis=1) / jnp.maximum(jnp.sum(sv, axis=1), 1e-12)
    max_sv, min_sv = jnp.min(sv_degrees), jnp.max(sv_degrees)
    return ((sv_degrees - min_sv) / (max_sv - min_sv)).reshape(h, w)
