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


# ----------------------------------------------------------------------
# the reference's exported battery (`correlation.py:352-402`): median of
# per-column pearson/spearman/concordance, gram-matrix and subspace
# similarities. Matched pairs (same shapes and centering); soft_rank is
# replaced with exact ranks (eval-only here; torchsort soft ranks exist
# in the reference purely for differentiability).


def _pearson_cols(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Per-column Pearson r (`correlation.py:13-32`)."""
    Xc, Yc = _center(X), _center(Y)
    cov = (Xc * Yc).sum(0) / (X.shape[0] - 1)
    sx = X.std(0, ddof=1)
    sy = Y.std(0, ddof=1)
    return cov / jnp.maximum(sx * sy, 1e-12)


def pearson(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Median per-column Pearson (`correlation.py:352-353`)."""
    return jnp.median(_pearson_cols(X, Y))


def _ranks_lastdim(X: jax.Array) -> jax.Array:
    """Exact ranks along the feature axis (torchsort soft_rank role,
    `correlation.py:59-62`)."""
    return jnp.argsort(jnp.argsort(X, axis=-1), axis=-1).astype(X.dtype) + 1.0


def spearman(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Median per-column rank correlation (`correlation.py:356-357`)."""
    return pearson(_ranks_lastdim(X) / X.shape[-1], _ranks_lastdim(Y) / Y.shape[-1])


def concordance(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Median per-column concordance correlation coefficient
    (`correlation.py:36-56`)."""
    n = X.shape[0]
    bessel = (n - 1) / n
    r = _pearson_cols(X, Y)
    sx, sy = X.std(0, ddof=1), Y.std(0, ddof=1)
    mx, my = X.mean(0), Y.mean(0)
    ccc = 2 * r * sx * sy / (sx**2 + sy**2 + (mx - my) ** 2 / bessel)
    return jnp.median(ccc)


def autocorrcorr(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Pearson correlation of the two self-similarity (gram) matrices'
    upper triangles (`correlation.py:72-85`)."""
    Xc = _center(X)
    Yc = _center(Y)
    Xn = Xc / jnp.maximum(jnp.linalg.norm(Xc, axis=1, keepdims=True), 1e-12)
    Yn = Yc / jnp.maximum(jnp.linalg.norm(Yc, axis=1, keepdims=True), 1e-12)
    t = X.shape[0]
    iu, ju = jnp.triu_indices(t, k=1)
    a = (Xn @ Xn.T)[iu, ju]
    b = (Yn @ Yn.T)[iu, ju]
    return _pearson_cols(a[:, None], b[:, None])[0]


def rvadj_maye(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Maye-adjusted RV on standardized data (`correlation.py:125-162`,
    standardized branch)."""
    X = _center(X) / jnp.maximum(X.std(0, keepdims=True), 1e-12)
    Y = _center(Y) / jnp.maximum(Y.std(0, keepdims=True), 1e-12)
    n, p = X.shape
    q = Y.shape[1]
    XX, YY = X.T @ X, Y.T @ Y
    adj = lambda tr, ab: ab - (n - 1) / (n - 2) * (ab - tr / (n - 1) ** 2)
    xy = adj(jnp.trace(XX @ YY), p * q)
    xx = adj(jnp.trace(XX @ XX), p * p)
    yy = adj(jnp.trace(YY @ YY), q * q)
    return xy / jnp.sqrt(jnp.maximum(xx * yy, 1e-12))


def rvadj_ghaziri(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Ghaziri-adjusted RV (`correlation.py:165-180`)."""
    X, Y = _center(X), _center(Y)
    n = X.shape[0]
    XX, YY = X.T @ X, Y.T @ Y
    rv_ = jnp.trace(XX @ YY) / jnp.maximum(
        jnp.linalg.norm(XX @ XX) * jnp.linalg.norm(YY @ YY), 1e-12
    )
    mrvB = (
        jnp.sqrt(jnp.trace(XX) ** 2 / jnp.maximum(jnp.trace(XX @ XX), 1e-12))
        * jnp.sqrt(jnp.trace(YY) ** 2 / jnp.maximum(jnp.trace(YY @ YY), 1e-12))
        / (n - 1)
    )
    return (rv_ - mrvB) / jnp.maximum(1 - mrvB, 1e-12)


def smi(X: jax.Array, Y: jax.Array, n_components: int = 10) -> jax.Array:
    """Similarity of Matrices Index, orthogonal projection: median of
    the cumulative subspace-overlap grid (`correlation.py:188-276,
    376-377`)."""
    X, Y = _center(X), _center(Y)
    k = min(n_components, min(X.shape), min(Y.shape))
    UX = jnp.linalg.svd(X, full_matrices=False)[0][:, :k]
    UY = jnp.linalg.svd(Y, full_matrices=False)[0][:, :k]
    m = jnp.minimum(jnp.arange(k)[:, None], jnp.arange(k)[None, :]) + 1
    grid = jnp.cumsum(jnp.cumsum((UX.T @ UY) ** 2, axis=1), axis=0) / m
    return jnp.median(jnp.clip(grid, 0.0, 1.0))


def r1(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Row-gram inner-product similarity (`correlation.py:278-283`)."""
    X, Y = _center(X), _center(Y)
    return jnp.trace(X @ Y.T) / jnp.sqrt(
        jnp.maximum(jnp.trace(X @ X.T) * jnp.trace(Y @ Y.T), 1e-12)
    )


def _svd_centered(Z):
    U, s, Vt = jnp.linalg.svd(Z, full_matrices=False)
    return U, s, Vt


def r2(X: jax.Array, Y: jax.Array) -> jax.Array:
    """r1 on the scaled left singular bases (`correlation.py:286-292`)."""
    UX, sX, _ = _svd_centered(_center(X))
    UY, sY, _ = _svd_centered(_center(Y))
    return r1(UX * sX[None], UY * sY[None])


def r3(X: jax.Array, Y: jax.Array) -> jax.Array:
    """r1 on the orthogonal polar factors (`correlation.py:296-302`)."""
    UX, _, VXt = _svd_centered(_center(X))
    UY, _, VYt = _svd_centered(_center(Y))
    return r1(UX @ VXt, UY @ VYt)


def r4(X: jax.Array, Y: jax.Array) -> jax.Array:
    """r1 on the left singular bases (`correlation.py:306-310`)."""
    return r1(_svd_centered(_center(X))[0], _svd_centered(_center(Y))[0])


def rG(X: jax.Array, Y: jax.Array, n_components: int = 10) -> jax.Array:
    """Yanai's GCD on truncated principal subspace projectors.

    The reference's `correlation.py:314-322` compares `UX.T @ UX` to
    `UY.T @ UY` — both exactly identity for orthonormal U, so it always
    returns 1 (a reference bug; it is not in their exported battery).
    This implements the intended coefficient on the projectors
    `U @ U.T`: trace(Px Py) / sqrt(trace(Px²) trace(Py²))
    = ||UXᵀUY||_F² / sqrt(kx·ky)."""
    k = min(n_components, min(X.shape), min(Y.shape))
    UX = _svd_centered(_center(X))[0][:, :k]
    UY = _svd_centered(_center(Y))[0][:, :k]
    return jnp.sum((UX.T @ UY) ** 2) / k


def coxhead2(X: jax.Array, Y: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Coxhead's multivariate association (`correlation.py:334-352`).

    Computed in feature space with a relative ridge: the reference's
    raw T×T row-gram pseudo-inverses explode when Y lies (near) in the
    span of X — exactly the interesting case — because the conditional
    covariance Syy - Syx Sxx⁻¹ Sxy degenerates to 0."""
    X, Y = _center(X), _center(Y)
    if Y.shape[1] > X.shape[1]:
        X, Y = Y, X
    q = Y.shape[1]
    Sxx = X.T @ X
    Syy = Y.T @ Y
    Sxy = X.T @ Y
    ridge_x = eps * jnp.trace(Sxx) / X.shape[1]
    A = Sxy.T @ jnp.linalg.solve(Sxx + ridge_x * jnp.eye(X.shape[1]), Sxy)  # explained part of Syy
    E = Syy - A
    M = jnp.linalg.pinv(E + eps * jnp.trace(Syy) / q * jnp.eye(q))
    return jnp.trace(M @ A) / jnp.maximum(jnp.trace(M @ Syy), 1e-12)


def _canonical_correlations(X: jax.Array, Y: jax.Array, eps: float = 1e-6):
    """Canonical correlations + the X-basis that attains them."""
    X, Y = _center(X), _center(Y)
    n = X.shape[0]
    Sxx = X.T @ X / n + eps * jnp.eye(X.shape[1])
    Syy = Y.T @ Y / n + eps * jnp.eye(Y.shape[1])
    Sxy = X.T @ Y / n

    def inv_sqrt(S):
        eva, eve = jnp.linalg.eigh(S)
        return (eve * (1.0 / jnp.sqrt(jnp.maximum(eva, eps)))[None]) @ eve.T

    Wx = inv_sqrt(Sxx)
    M = Wx @ Sxy @ inv_sqrt(Syy)
    U, s, _ = jnp.linalg.svd(M, full_matrices=False)
    return jnp.clip(s, 0, 1), Wx @ U  # (k,), X-side canonical directions


def svcca(X: jax.Array, Y: jax.Array, accept_rate: float = 0.99) -> jax.Array:
    """SVCCA similarity: CCA on the principal subspaces keeping
    `accept_rate` of the variance (`correlation.py:389-390` role)."""
    import numpy as np

    def principal(Z):
        Zc = _center(Z)
        U, s, _ = jnp.linalg.svd(Zc, full_matrices=False)
        energy = np.cumsum(np.asarray(s) ** 2)
        energy = energy / max(energy[-1], 1e-12)
        k = int(np.searchsorted(energy, accept_rate)) + 1
        return (U * s[None])[:, :k]

    corrs, _ = _canonical_correlations(principal(X), principal(Y))
    return jnp.mean(corrs)


def pwcca(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Projection-weighted mean canonical correlation
    (`correlation.py:393-394` role)."""
    corrs, dirs = _canonical_correlations(X, Y)
    proj = jnp.abs((_center(X) @ dirs).T @ _center(X)).sum(axis=1)
    w = proj / jnp.maximum(proj.sum(), 1e-12)
    return jnp.sum(w * corrs)


def op(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Orthogonal-procrustes similarity: nuclear norm of the normalized
    cross-gram (`correlation.py:401-402` role)."""
    Xc, Yc = _center(X), _center(Y)
    Xn = Xc / jnp.maximum(jnp.linalg.norm(Xc), 1e-12)
    Yn = Yc / jnp.maximum(jnp.linalg.norm(Yc), 1e-12)
    return jnp.sum(jnp.linalg.svd(Xn.T @ Yn, compute_uv=False))


METRICS: Dict[str, Callable] = {
    # the reference's exported battery (`correlation.py:416`)
    "pearson": pearson,
    "spearman": spearman,
    "concordance": concordance,
    "autocorrcorr": autocorrcorr,
    "rv": rv,
    "rv2": rv2,
    "smi": smi,
    "r1": r1,
    "r3": r3,
    "svcca": svcca,
    "pwcca": pwcca,
    "linear_cka": linear_cka,
    "op": op,
    # internal variants + extras
    "rvadj_maye": rvadj_maye,
    "rvadj_ghaziri": rvadj_ghaziri,
    "r2": r2,
    "r4": r4,
    "rG": rG,
    "coxhead2": coxhead2,
    "rbf_cka": rbf_cka,
    "hsic": hsic,
    "cca": cca,
    "distance_correlation": distance_correlation,
    "pearson_mean": pearson_mean,
    "norm_similarity": norm_similarity,
}


# these metrics only exist for matched feature dimensions (per-column
# stats, trace(X @ Y.T) contractions, or trace(XX @ YY) of the two
# feature-space grams)
_MATCHED_DIMS_ONLY = (
    "pearson", "spearman", "concordance", "r1", "r2", "r3", "r4",
    "rvadj_maye", "rvadj_ghaziri",
)


def audio_video_correlation(audio_feats: jax.Array, video_feats: jax.Array) -> Dict[str, float]:
    """Full metric battery (`features/correlation.py` usage)."""
    t = min(audio_feats.shape[0], video_feats.shape[0])
    X = jnp.asarray(audio_feats)[:t]
    Y = jnp.asarray(video_feats)[:t]
    return {
        name: float(fn(X, Y))
        for name, fn in METRICS.items()
        if X.shape[1] == Y.shape[1] or name not in _MATCHED_DIMS_ONLY
    }
