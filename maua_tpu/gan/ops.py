"""StyleGAN primitive ops, TPU-native.

Semantics match the reference's pure-torch reimplementation of the
NVIDIA ops (`maua/GAN/wrappers/inference/ops.py`): bias_act :65-84,
upfirdn2d :87-114, upsample2d :117-133, normalize_2nd_moment :142-143,
modulated_conv2d :146-186, conv2d_resample :189-233, setup_filter
:236-256 — but the implementation is redesigned for XLA/TPU:

* `upfirdn2d` is ONE `lax.conv_general_dilated` call: zero-insert
  upsampling is `lhs_dilation`, pad/crop is (possibly negative)
  conv padding, FIR is a depthwise kernel, downsampling is the window
  stride. XLA fuses the whole thing; no intermediate buffers.
* `modulated_conv2d` never materializes per-sample weights (the
  reference's B-group grouped conv, `inference/ops.py:168-182`).
  Because convolution is linear, per-sample weight modulation equals
  input scaling, and demodulation equals output scaling:
      y[b,o] = demod[b,o] * conv(x[b] * styles[b], W)[o]
      demod[b,o] = rsqrt(sum_i styles[b,i]^2 * sum_hw W[h,w,i,o]^2 + eps)
  This keeps the conv a single large batched matmul on the MXU.

Layout: NHWC activations, HWIO weights. All functions are jittable
with static config arguments.
"""

from __future__ import annotations

import math

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")

# activation -> (fn, default gain); mirrors reference activation_funcs
# table (`inference/ops.py:9-19`)
_SQRT2 = math.sqrt(2.0)


def activate(x: jax.Array, act: str, alpha: float = 0.2) -> jax.Array:
    if act == "linear":
        return x
    if act == "relu":
        return jax.nn.relu(x)
    if act == "lrelu":
        return jax.nn.leaky_relu(x, alpha)
    if act == "tanh":
        return jnp.tanh(x)
    if act == "sigmoid":
        return jax.nn.sigmoid(x)
    if act == "elu":
        return jax.nn.elu(x)
    if act == "selu":
        return jax.nn.selu(x)
    if act == "softplus":
        return jax.nn.softplus(x)
    if act == "swish":
        return jax.nn.sigmoid(x) * x
    raise ValueError(f"unknown activation {act}")


def activation_gain(act: str) -> float:
    return _SQRT2 if act in ("relu", "lrelu", "swish") else 1.0


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Fused bias + activation + gain + clamp (`inference/ops.py:65-84`).

    Channel axis is the last axis (NHWC / N...C)."""
    alpha = 0.2 if alpha is None else alpha
    gain = activation_gain(act) if gain is None else gain
    if b is not None:
        x = x + b.astype(x.dtype)
    x = activate(x, act, alpha)
    if gain != 1:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


def setup_filter(
    f: Optional[Sequence[float]],
    normalize: bool = True,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> np.ndarray:
    """FIR filter preparation (`inference/ops.py:236-256`). Returns a
    2-D numpy filter (outer product when the 1-D tap count is < 8 and
    separable isn't forced)."""
    if f is None:
        f = [1.0]
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 0:
        f = f[None]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    f = f * (gain ** (f.ndim / 2))
    return f


def _depthwise_kernel(f: np.ndarray, channels: int, dtype) -> jax.Array:
    # (fh, fw) -> (fh, fw, 1, C) for feature_group_count=C
    fh, fw = f.shape
    return jnp.tile(jnp.asarray(f, dtype)[:, :, None, None], (1, 1, 1, channels))


def upfirdn2d(
    x: jax.Array,
    f: Optional[np.ndarray],
    up: int = 1,
    down: int = 1,
    padding: Tuple[int, int, int, int] = (0, 0, 0, 0),
    gain: float = 1.0,
) -> jax.Array:
    """Upsample-FIR-downsample in one fused conv
    (`inference/ops.py:87-114`). x: NHWC; f: 2-D numpy filter from
    `setup_filter`; padding: (padx0, padx1, pady0, pady1) relative to
    the upsampled image, may be negative (crop)."""
    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    padx0, padx1, pady0, pady1 = padding
    c = x.shape[-1]
    if f.ndim == 1:
        # separable: two 1-D depthwise passes (SG3's kaiser-sinc
        # filters); gain^(1/2) per pass
        f1 = (f * (gain ** 0.5)).astype(np.float32)
        ky = jnp.tile(jnp.asarray(f1, x.dtype)[:, None, None, None], (1, 1, 1, c))
        kx = jnp.tile(jnp.asarray(f1, x.dtype)[None, :, None, None], (1, 1, 1, c))
        y = jax.lax.conv_general_dilated(
            x, ky, window_strides=(down, 1), padding=((pady0, pady1 + up - 1), (0, 0)),
            lhs_dilation=(up, 1), feature_group_count=c, dimension_numbers=_DN,
        )
        return jax.lax.conv_general_dilated(
            y, kx, window_strides=(1, down), padding=((0, 0), (padx0, padx1 + up - 1)),
            lhs_dilation=(1, up), feature_group_count=c, dimension_numbers=_DN,
        )
    fgained = f * (gain ** (f.ndim / 2))
    kernel = _depthwise_kernel(fgained, c, x.dtype)
    # lhs_dilation yields (H-1)*up+1 samples; the reference's
    # zero-insert upsampling appends a trailing zero per sample (H*up),
    # so add (up-1) to the high-side padding to match.
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(down, down),
        padding=((pady0, pady1 + up - 1), (padx0, padx1 + up - 1)),
        lhs_dilation=(up, up),
        feature_group_count=c,
        dimension_numbers=_DN,
    )


def _filter_size(f: Optional[np.ndarray]) -> Tuple[int, int]:
    if f is None:
        return 1, 1
    return f.shape[-1], f.shape[0]  # (fw, fh), matching reference :136-139


def upsample2d(x: jax.Array, f: np.ndarray, up: int = 2, padding: int = 0, gain: float = 1.0) -> jax.Array:
    """FIR upsample (`inference/ops.py:117-133`)."""
    fw, fh = _filter_size(f)
    p = (
        padding + (fw + up - 1) // 2,
        padding + (fw - up) // 2,
        padding + (fh + up - 1) // 2,
        padding + (fh - up) // 2,
    )
    return upfirdn2d(x, f, up=up, padding=p, gain=gain * up * up)


def downsample2d(x: jax.Array, f: np.ndarray, down: int = 2, padding: int = 0, gain: float = 1.0) -> jax.Array:
    """FIR downsample (NVIDIA upfirdn2d.downsample2d semantics)."""
    fw, fh = _filter_size(f)
    p = (
        padding + (fw - down + 1) // 2,
        padding + (fw - down) // 2,
        padding + (fh - down + 1) // 2,
        padding + (fh - down) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=p)


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """(`inference/ops.py:142-143`)"""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[np.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
) -> jax.Array:
    """2-D conv with optional FIR up/downsampling
    (`inference/ops.py:189-233`). x: NHWC, w: HWIO.

    The up>1 branch reproduces the reference's
    transpose-conv-then-upfirdn decomposition (including its asymmetric
    padding algebra) with `lhs_dilation` standing in for the transposed
    conv.
    """
    kh, kw = w.shape[0], w.shape[1]
    fw, fh = _filter_size(f)
    px0 = px1 = py0 = py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up > 1:
        # transpose-conv decomposition (`inference/ops.py:211-228`):
        # conv_transpose(x, w, stride=up, padding=pt) then FIR.
        px0 -= kw - 1
        px1 -= kw - up
        py0 -= kh - 1
        py1 -= kh - up
        pxt = max(min(-px0, -px1), 0)
        pyt = max(min(-py0, -py1), 0)
        # conv_transpose == zero-insert (lhs_dilation) + correlation
        # with the spatially flipped kernel, padded (k-1-pt).
        w_t = jnp.flip(w, axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x,
            w_t,
            window_strides=(1, 1),
            padding=((kh - 1 - pyt, kh - 1 - pyt), (kw - 1 - pxt, kw - 1 - pxt)),
            lhs_dilation=(up, up),
            dimension_numbers=_DN,
        )
        y = upfirdn2d(y, f, padding=(px0 + pxt, px1 + pxt, py0 + pyt, py1 + pyt), gain=up**2)
        if down > 1:
            y = upfirdn2d(y, f, down=down)
        return y

    if down > 1:
        y = upfirdn2d(x, f, padding=(px0, px1, py0, py1))
        return jax.lax.conv_general_dilated(
            y, w, window_strides=(down, down), padding="VALID", dimension_numbers=_DN
        )

    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((py0, py1), (px0, px1)), dimension_numbers=_DN
    )


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C) cell grid; channel index is
    (p*2+q)*C + c for fine position (p, q) inside the 2x2 cell."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of `space_to_depth`."""
    B, h, w, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, h, w, 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * h, 2 * w, C)


def s2d_cell_kernel(w: jax.Array) -> jax.Array:
    """Lift a 3x3 HWIO kernel to the 2x2-cell grid: the stride-1 SAME
    conv on the fine grid equals a 3x3 SAME conv between
    `space_to_depth` grids with this (3, 3, 4Ci, 4Co) kernel.

    Fine output row 2I+p' draws on fine rows 2I+p'+d (d in [-1,1]) =
    cell row I+a, phase p with 2a+p = p'+d; blocks outside that
    relation are zero. The dense cell conv runs 4x the fine FLOPs, but
    with 4x the channels it keeps the MXU's 128 lanes full where the
    fine conv idles on lane padding (Ci/Co < 128 at large spatial
    sizes) — measured net wins on the SG3 tail and RRDB trunks."""
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError("s2d_cell_kernel supports 3x3 kernels")
    blocks = []
    for a in (-1, 0, 1):
        row = []
        for b in (-1, 0, 1):
            # (4Ci, 4Co) block for cell offset (a, b)
            cell = []
            for p in (0, 1):
                for q in (0, 1):
                    rowb = []
                    for pp in (0, 1):
                        for qq in (0, 1):
                            d = 2 * a + p - pp
                            e = 2 * b + q - qq
                            if -1 <= d <= 1 and -1 <= e <= 1:
                                rowb.append(w[d + 1, e + 1])
                            else:
                                rowb.append(jnp.zeros((ci, co), w.dtype))
                    cell.append(jnp.concatenate(rowb, axis=1))  # (ci, 4co)
            row.append(jnp.concatenate(cell, axis=0))  # (4ci, 4co)
        blocks.append(jnp.stack(row))  # (3, 4ci, 4co)
    return jnp.stack(blocks)  # (3, 3, 4ci, 4co)


def conv2d_s2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME-padded stride-1 3x3 conv evaluated on the 2x2 cell grid
    (`s2d_cell_kernel`); exact vs the direct conv for even H, W."""
    y = jax.lax.conv_general_dilated(
        space_to_depth(x), s2d_cell_kernel(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN,
    )
    return depth_to_space(y)


def modulated_conv2d(
    x: jax.Array,  # (B, H, W, Ci)
    weight: jax.Array,  # (kh, kw, Ci, Co) HWIO
    styles: jax.Array,  # (B, Ci)
    noise: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[np.ndarray] = None,
    demodulate: bool = True,
    s2d: bool = False,
) -> jax.Array:
    """Style-modulated conv (`inference/ops.py:146-186`), reformulated
    as input-scale -> shared conv -> output-demod so the conv stays one
    batched MXU matmul instead of a B-group grouped conv.

    Numerically identical to the reference's per-sample-weight
    formulation up to float associativity. The demod coefficients are
    always computed in float32 (replaces the reference's fp16
    pre-normalization at :160-165 — bf16 shares f32's exponent range,
    so overflow protection is unnecessary).
    """
    in_dtype = x.dtype
    x = x * styles.astype(in_dtype)[:, None, None, :]
    if s2d and up == 1 and down == 1 and weight.shape[:2] == (3, 3) and padding == 1 \
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        # cell-grid evaluation: 4x FLOPs, full MXU lanes (see
        # s2d_cell_kernel) — the winning trade at Co < 128 and large H
        y = conv2d_s2d(x, weight.astype(in_dtype))
    elif weight.shape[:2] == (1, 1) and up == 1 and down == 1 and padding == 0:
        # 1x1 conv as a plain contraction: XLA's conv lowering costs 4x
        # a dot at these shapes (torgb 1024^2 32->3 measured 19.2 ms as
        # conv_general_dilated vs 4.9 ms as einsum, f32, batch 8 —
        # workspace/profiling/bench_sg3_convs.py)
        y = jnp.einsum("bhwc,co->bhwo", x, weight[0, 0].astype(in_dtype))
    else:
        y = conv2d_resample(x, weight.astype(in_dtype), f=resample_filter, up=up, down=down, padding=padding)
    if demodulate:
        w32 = weight.astype(jnp.float32)
        w2 = jnp.sum(jnp.square(w32), axis=(0, 1))  # (Ci, Co)
        s2 = jnp.square(styles.astype(jnp.float32))  # (B, Ci)
        d = jax.lax.rsqrt(s2 @ w2 + 1e-8)  # (B, Co)
        y = y * d.astype(in_dtype)[:, None, None, :]
    if noise is not None:
        y = y + noise.astype(in_dtype)
    return y
