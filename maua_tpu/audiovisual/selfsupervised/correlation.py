"""Audio-video alignment correlation metrics, jittable.

Rebuild of `selfsupervised/features/correlation.py:13-401` (20+
jit-scripted similarity metrics: RV/RV2/CCA/CKA/HSIC/distance
correlation/...). X: (T, Dx), Y: (T, Dy) feature trajectories.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def _center(x):
    return x - x.mean(axis=0, keepdims=True)


def rv(X: jax.Array, Y: jax.Array) -> jax.Array:
    """RV coefficient."""
    X, Y = _center(X), _center(Y)
    Sxy = X.T @ Y
    Sxx = X.T @ X
    Syy = Y.T @ Y
    num = jnp.trace(Sxy @ Sxy.T)
    den = jnp.sqrt(jnp.trace(Sxx @ Sxx) * jnp.trace(Syy @ Syy))
    return num / jnp.maximum(den, 1e-10)


def rv2(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Modified RV (diagonal-removed)."""
    X, Y = _center(X), _center(Y)
    AA = X @ X.T
    BB = Y @ Y.T
    AA = AA - jnp.diag(jnp.diag(AA))
    BB = BB - jnp.diag(jnp.diag(BB))
    num = jnp.trace(AA @ BB)
    den = jnp.sqrt(jnp.trace(AA @ AA) * jnp.trace(BB @ BB))
    return num / jnp.maximum(den, 1e-10)


def linear_cka(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Linear centered kernel alignment."""
    X, Y = _center(X), _center(Y)
    num = jnp.sum(jnp.square(Y.T @ X))
    den = jnp.linalg.norm(X.T @ X) * jnp.linalg.norm(Y.T @ Y)
    return num / jnp.maximum(den, 1e-10)


def _rbf_gram(X, sigma_frac=0.5):
    sq = jnp.sum(jnp.square(X), 1)
    d2 = jnp.maximum(sq[:, None] + sq[None] - 2 * X @ X.T, 0.0)
    med = jnp.median(d2)
    return jnp.exp(-d2 / jnp.maximum(2 * sigma_frac * med, 1e-10))


def _center_gram(K):
    n = K.shape[0]
    H = jnp.eye(n) - 1.0 / n
    return H @ K @ H


def rbf_cka(X: jax.Array, Y: jax.Array) -> jax.Array:
    Kx = _center_gram(_rbf_gram(X))
    Ky = _center_gram(_rbf_gram(Y))
    num = jnp.sum(Kx * Ky)
    den = jnp.sqrt(jnp.sum(Kx * Kx) * jnp.sum(Ky * Ky))
    return num / jnp.maximum(den, 1e-10)


def hsic(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Hilbert-Schmidt independence criterion (biased, RBF)."""
    n = X.shape[0]
    Kx = _center_gram(_rbf_gram(X))
    Ky = _center_gram(_rbf_gram(Y))
    return jnp.sum(Kx * Ky) / (n - 1) ** 2


def cca(X: jax.Array, Y: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Mean canonical correlation."""
    X, Y = _center(X), _center(Y)
    n = X.shape[0]
    Sxx = X.T @ X / n + eps * jnp.eye(X.shape[1])
    Syy = Y.T @ Y / n + eps * jnp.eye(Y.shape[1])
    Sxy = X.T @ Y / n

    def inv_sqrt(S):
        eva, eve = jnp.linalg.eigh(S)
        return (eve * (1.0 / jnp.sqrt(jnp.maximum(eva, eps)))[None]) @ eve.T

    M = inv_sqrt(Sxx) @ Sxy @ inv_sqrt(Syy)
    s = jnp.linalg.svd(M, compute_uv=False)
    return jnp.mean(jnp.clip(s, 0, 1))


def distance_correlation(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Szekely distance correlation."""

    def dmat(Z):
        sq = jnp.sum(jnp.square(Z), 1)
        d = jnp.sqrt(jnp.maximum(sq[:, None] + sq[None] - 2 * Z @ Z.T, 0.0))
        return d - d.mean(0, keepdims=True) - d.mean(1, keepdims=True) + d.mean()

    A, B = dmat(X), dmat(Y)
    dcov2 = jnp.mean(A * B)
    dvar_x = jnp.mean(A * A)
    dvar_y = jnp.mean(B * B)
    return jnp.sqrt(jnp.maximum(dcov2, 0)) / jnp.maximum(jnp.sqrt(jnp.sqrt(dvar_x * dvar_y)), 1e-10)


def pearson_mean(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Mean absolute pairwise Pearson correlation."""
    Xn = _center(X) / jnp.maximum(X.std(0, keepdims=True), 1e-10)
    Yn = _center(Y) / jnp.maximum(Y.std(0, keepdims=True), 1e-10)
    C = Xn.T @ Yn / X.shape[0]
    return jnp.mean(jnp.abs(C))


def norm_similarity(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Correlation of the per-frame magnitude envelopes."""
    nx = jnp.linalg.norm(X, axis=1)
    ny = jnp.linalg.norm(Y, axis=1)
    nx = (nx - nx.mean()) / jnp.maximum(nx.std(), 1e-10)
    ny = (ny - ny.mean()) / jnp.maximum(ny.std(), 1e-10)
    return jnp.mean(nx * ny)


METRICS: Dict[str, Callable] = {
    "rv": rv,
    "rv2": rv2,
    "linear_cka": linear_cka,
    "rbf_cka": rbf_cka,
    "hsic": hsic,
    "cca": cca,
    "distance_correlation": distance_correlation,
    "pearson_mean": pearson_mean,
    "norm_similarity": norm_similarity,
}


def audio_video_correlation(audio_feats: jax.Array, video_feats: jax.Array) -> Dict[str, float]:
    """Full metric battery (`features/correlation.py` usage)."""
    t = min(audio_feats.shape[0], video_feats.shape[0])
    X = jnp.asarray(audio_feats)[:t]
    Y = jnp.asarray(video_feats)[:t]
    return {name: float(fn(X, Y)) for name, fn in METRICS.items()}
