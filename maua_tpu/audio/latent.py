"""Latent-space interpolation for audio-reactive synthesis.

Rebuild of `audioreactive/latent.py` (single_weighted :12-18,
multi_weighted :21-31, select_modulo :34-46, slerp :57-66, slerp_loops
:69-79, spline_loops :82-91, tempo_loops :94-102). Natural cubic
splines are implemented from scratch (tridiagonal solve) replacing the
torchcubicspline dependency.

Known divergence: the reference's `slerp_loops` flattens the
(T, pairs, ...) slerp output time-major (`latent.py:77`), interleaving
latent pairs frame-by-frame; we flatten pair-major so each segment is
a contiguous chunk of frames (the evident intent).
"""

from __future__ import annotations




import jax
from functools import partial
import jax.numpy as jnp


from ..ops.signal import gaussian_filter, normalize, resample_1d


def single_weighted(low_latent: jax.Array, high_latent: jax.Array, envelope: jax.Array) -> jax.Array:
    """Blend two latents by an envelope (`latent.py:12-18`).
    (L, D), (L, D), (T,) -> (T, L, D)."""
    e = envelope[:, None, None]
    return low_latent[None] * (1 - e) + high_latent[None] * e


def multi_weighted(latents: jax.Array, envelopes: jax.Array) -> jax.Array:
    """Weighted sum of latents by per-latent envelopes
    (`latent.py:21-31`). (K, L, D), (T, K) -> (T, L, D)."""
    w = envelopes / jnp.maximum(envelopes.sum(axis=1, keepdims=True), 1e-10)
    k = envelopes.shape[1]
    sel = latents[jnp.arange(k) % latents.shape[0]]  # (K, L, D)
    return jnp.einsum("tk,kld->tld", w, sel)


def select_modulo(latents: jax.Array, envelope: jax.Array, smooth: float = 2.0) -> jax.Array:
    """Quantize an envelope into latent indices (`latent.py:34-46`)."""
    low = jnp.quantile(envelope, 0.25)
    high = jnp.quantile(envelope, 0.75)
    idx = normalize(jnp.clip(envelope, low, high))
    idx = jnp.round(idx * (latents.shape[0] - 1)).astype(jnp.int32)
    out = latents[idx]
    return gaussian_filter(out, smooth, causal=0.0)


def eerp(a, b, t):
    """Exponential interpolation (`latent.py:49-50`)."""
    return a ** (1 - t) * b**t


def copeerp(a, b, t):
    """Co-exponential interpolation (`latent.py:53-54`)."""
    return a**t * (1 - b**t) / (1 - a**t + b**t)


def slerp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation (`latent.py:57-66`): the standard
    sin((1-t)w)/sin(w) * a + sin(tw)/sin(w) * b on the RAW vectors, so
    latent magnitudes are preserved (at t=0 the output is exactly a —
    StyleGAN w vectors are not unit-norm).
    a, b: (K, L, D); t: (T,) -> (T, K, L, D)."""
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
    d = jnp.clip(jnp.sum(an * bn, axis=-1, keepdims=True), -1.0, 1.0)  # (K, L, 1)
    omega = jnp.arccos(d)[None]  # (1, K, L, 1)
    so = jnp.sin(omega)
    tt = t[:, None, None, None]
    safe = jnp.maximum(so, 1e-6)
    slerped = (jnp.sin((1.0 - tt) * omega) / safe) * a[None] + (jnp.sin(tt * omega) / safe) * b[None]
    lerped = (1.0 - tt) * a[None] + tt * b[None]
    return jnp.where(so < 1e-6, lerped, slerped)


def slerp_loops(y: jax.Array, size: int, n_loops: int) -> jax.Array:
    """Looping slerp through latents (`latent.py:69-79`).
    (K, L, D) -> (size, L, D)."""
    y = jnp.concatenate([jnp.tile(y, (n_loops, 1, 1)), y[:1]], axis=0)
    n_seg = y.shape[0] - 1
    steps = max(round(size / y.shape[0]), 1)
    t = jnp.linspace(0, 1, steps)
    ya, yb = y[:-1], y[1:]
    out = slerp(ya, yb, t)  # (steps, n_seg, L, D)
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(n_seg * steps, *y.shape[1:])
    return resample_1d(out, size)


# ------------------------------------------------- natural cubic spline
def natural_cubic_spline_coeffs(t: jax.Array, y: jax.Array):
    """Natural cubic spline through (t_i, y_i).

    t: (N,) strictly increasing; y: (N, ...). Returns (t, a, b, c, d)
    with per-interval cubics a + b*dt + c*dt^2 + d*dt^3 (replaces
    torchcubicspline used at `latent.py:4,88-90`)."""
    n = t.shape[0]
    h = t[1:] - t[:-1]  # (N-1,)
    y2 = y.reshape(n, -1)
    # second-derivative system: tridiagonal (natural BCs: M_0 = M_{n-1} = 0)
    diag = jnp.concatenate([jnp.ones(1), 2.0 * (h[:-1] + h[1:]), jnp.ones(1)])
    lower = jnp.concatenate([h[:-1], jnp.zeros(1)])
    upper = jnp.concatenate([jnp.zeros(1), h[1:]])
    A = jnp.diag(diag) + jnp.diag(lower, -1) + jnp.diag(upper, 1)
    dy = (y2[1:] - y2[:-1]) / h[:, None]
    rhs = jnp.concatenate([jnp.zeros((1, y2.shape[1])), 6.0 * (dy[1:] - dy[:-1]), jnp.zeros((1, y2.shape[1]))])
    M = jnp.linalg.solve(A, rhs)  # (N, F) second derivatives
    a = y2[:-1]
    b = dy - h[:, None] * (2.0 * M[:-1] + M[1:]) / 6.0
    c = M[:-1] / 2.0
    d = (M[1:] - M[:-1]) / (6.0 * h[:, None])
    shape = y.shape[1:]
    return t, a.reshape(-1, *shape), b.reshape(-1, *shape), c.reshape(-1, *shape), d.reshape(-1, *shape)


def natural_cubic_spline_evaluate(coeffs, t_out: jax.Array) -> jax.Array:
    t, a, b, c, d = coeffs
    idx = jnp.clip(jnp.searchsorted(t, t_out, side="right") - 1, 0, t.shape[0] - 2)
    dt = (t_out - t[idx]).reshape((-1,) + (1,) * (a.ndim - 1))
    return a[idx] + b[idx] * dt + c[idx] * dt**2 + d[idx] * dt**3


@partial(jax.jit, static_argnames=("size", "n_loops"))
def spline_loops(y: jax.Array, size: int, n_loops: int) -> jax.Array:
    """Looping natural-cubic-spline interpolation (`latent.py:82-91`).
    (K, L, D) -> (size, L, D)."""
    y = jnp.concatenate([jnp.tile(y, (n_loops, 1, 1)), y[:1]], axis=0)
    t_in = jnp.linspace(0.0, 1.0, y.shape[0])
    t_out = jnp.linspace(0.0, 1.0, size)
    coeffs = natural_cubic_spline_coeffs(t_in, y)
    return natural_cubic_spline_evaluate(coeffs, t_out)


def tempo_loops(latents: jax.Array, n_frames: int, fps: float, tempo: float, type: str = "spline") -> jax.Array:
    """Loop latents synced to the music tempo (`latent.py:94-102`)."""
    bars_per_sec = tempo / 4.0 / 60.0
    duration = n_frames / fps
    n_loops = max(round(duration * bars_per_sec), 1)
    if type == "spline":
        return spline_loops(latents, n_frames, n_loops)
    return slerp_loops(latents, n_frames, n_loops)
