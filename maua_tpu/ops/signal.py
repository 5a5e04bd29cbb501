"""Time-axis signal toolkit for audio-reactive envelopes.

TPU-native rebuild of the reference's envelope processing
(`maua/audiovisual/audioreactive/signal.py:5-157`): linear time
resampling, normalization, peak-percentile clipping, compression, and
causal/circular gaussian smoothing. All functions are pure and
jittable; shapes are static so they compile once per envelope length.

Convention: the time axis is axis 0, matching the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("size",))
def resample_1d(x: jax.Array, size: int) -> jax.Array:
    """Linearly resample along the first (time) axis to `size` samples.

    Matches torch ``F.interpolate(mode="linear", align_corners=False)``
    as used by the reference (`audioreactive/signal.py:5-24`): output
    sample i reads input position (i + 0.5) * T_in / T_out - 0.5.
    """
    t_in = x.shape[0]
    scale = t_in / size
    pos = (jnp.arange(size, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, t_in - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    frac = (pos - lo).reshape((size,) + (1,) * (x.ndim - 1))
    xf = x.astype(jnp.float32)
    return xf[lo] * (1 - frac) + xf[hi] * frac


# alias with the reference's name; SURVEY maps it to audioreactive.signal.resample
resample = resample_1d


def normalize(x: jax.Array) -> jax.Array:
    """Min-max normalize to [0, 1] (`audioreactive/signal.py:27-38`)."""
    y = x - x.min()
    return y / y.max()


def percentile(signal: jax.Array, p: float) -> jax.Array:
    """kthvalue-style percentile matching the reference's rounding
    (`audioreactive/signal.py:41-53`): k = 1 + round(0.01*p*(n-1))."""
    flat = signal.reshape(-1)
    n = flat.shape[0]
    k = 1 + int(round(0.01 * float(p) * (n - 1)))
    return jnp.sort(flat)[k - 1]


def _masked_kthvalue(values: jax.Array, mask: jax.Array, p: float) -> jax.Array:
    """Percentile (reference rounding) over `values[mask]`, jit-safe.

    Non-masked entries sort to +inf so the k-th smallest of the masked
    subset is sorted[k-1]; k is computed from the traced mask count.
    """
    big = jnp.array(jnp.finfo(jnp.float32).max, values.dtype)
    masked = jnp.where(mask, values, big)
    srt = jnp.sort(masked.reshape(-1))
    n = jnp.maximum(mask.sum(), 1)
    k = 1 + jnp.round(0.01 * p * (n - 1)).astype(jnp.int32)
    return srt[k - 1]


@partial(jax.jit, static_argnames=("percent",))
@partial(jax.jit, static_argnames=("percent",))
def percentile_clip(signal: jax.Array, percent: float = 95.0) -> jax.Array:
    """Clip peaks above the `percent` percentile of local maxima, then
    normalize by the max (`audioreactive/signal.py:55-81`).

    Accepts (T,) or (T, C); peaks are detected per channel as strict
    local maxima against both neighbors (edge-clamped like the
    reference's clamp-indexing).
    """
    squeeze = signal.ndim < 2
    sig = signal[:, None] if squeeze else signal
    t = sig.shape[0]
    idx = jnp.arange(t)
    plus = sig[jnp.clip(idx + 1, 0, t - 1)]
    minus = sig[jnp.clip(idx - 1, 0, t - 1)]
    peaks = (sig > plus) & (sig > minus)

    def clip_channel(s, m):
        cutoff = _masked_kthvalue(s, m, percent)
        s = jnp.clip(s, 0.0, cutoff)
        return s / s.max()

    out = jax.vmap(clip_channel, in_axes=1, out_axes=1)(sig, peaks)
    return out[:, 0] if squeeze else out


def compress(signal: jax.Array, threshold: float, ratio: float, invert: bool = False) -> jax.Array:
    """Multiply values above (or below, if invert) threshold by ratio,
    then min-max normalize (`audioreactive/signal.py:84-100`)."""
    cond = signal < threshold if invert else signal > threshold
    return normalize(jnp.where(cond, signal * ratio, signal))


def expand(signal, threshold, ratio, invert=False):
    return compress(signal, threshold, ratio, invert)


def _pad_time(x: jax.Array, radius: int, mode: str) -> jax.Array:
    if mode == "circular":
        return jnp.pad(x, [(radius, radius)] + [(0, 0)] * (x.ndim - 1), mode="wrap")
    if mode == "replicate":
        return jnp.pad(x, [(radius, radius)] + [(0, 0)] * (x.ndim - 1), mode="edge")
    if mode == "reflect":
        return jnp.pad(x, [(radius, radius)] + [(0, 0)] * (x.ndim - 1), mode="reflect")
    raise ValueError(f"unknown pad mode {mode}")


@partial(jax.jit, static_argnames=("sigma", "causal", "mode"))
def gaussian_filter(x: jax.Array, sigma: float, causal=None, mode: str = "circular") -> jax.Array:
    """Smooth along the time (first) axis with a gaussian kernel.

    `causal` scales the future half of the kernel (0 = fully causal),
    matching `audioreactive/signal.py:108-157`. Radius is
    min(int(sigma*4), 3*T) and short sequences fall back to
    wrap+replicate padding like the reference.
    """
    if sigma <= 0:
        return x
    orig_shape = x.shape
    t = x.shape[0]
    flat = x.reshape(t, -1).astype(jnp.float32)

    radius = min(int(sigma * 4), 3 * t)
    if radius == 0:
        return x
    k = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kernel = jnp.exp(-0.5 / sigma**2 * k**2)
    if causal is not None:
        factor = causal if isinstance(causal, float) else 0.0
        kernel = kernel.at[radius + 1 :].multiply(factor)
    kernel = kernel / kernel.sum()

    if radius > t:
        padded = _pad_time(flat, t, mode)
        padded = _pad_time(padded, radius - t, "replicate")
    else:
        padded = _pad_time(flat, radius, mode)

    # depthwise 1-D convolution: (N=1, C, T) with feature groups
    c = flat.shape[1]
    lhs = padded.T[None]  # (1, C, T+2r)
    rhs = jnp.tile(kernel[None, None, :], (c, 1, 1))  # (C, 1, K)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID", feature_group_count=c,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[0].T.reshape(orig_shape)


def emphasize(x: jax.Array, strength: float, percentile_p: float = 75.0) -> jax.Array:
    """Accentuate peaks: x + strength * (x - clipped baseline), then
    normalize (equivalent of reference
    `selfsupervised/features/processing.py` emphasize)."""
    base = jnp.percentile(x, percentile_p)
    return normalize(x + strength * jnp.maximum(x - base, 0.0))
