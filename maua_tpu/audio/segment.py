"""Structural segmentation: recurrence matrices, differentiable
k-means, laplacian segmentation.

Rebuild of `rosa/segment.py` (recurrence_matrix :23-60,
differentiable_k_means :107-130, laplacian_segmentation :133-190) and
the reference's beat-synchronous recipe
(`audioreactive/mir.py:212-293`, after the librosa docs example).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .beat import onset_strength, tempo
from .constantq import cqt
from .convert import amplitude_to_db
from .spectral import _median_filter_axis, mfcc, spec_abs


def recurrence_matrix(
    X: jax.Array, k: Optional[int] = None, width: int = 1, metric: str = "cosine", sym: bool = True
) -> jax.Array:
    """Affinity-mode k-NN recurrence matrix (`rosa/segment.py:23-60`).
    X: (d, T) feature matrix -> (T, T) affinities in [0, 1]."""
    d, t = X.shape
    if k is None:
        k = min(t - 1, int(np.ceil(np.sqrt(t * (1 - width / t)))) if t > width else 1)

    if metric == "cosine":
        xn = X / jnp.maximum(jnp.linalg.norm(X, axis=0, keepdims=True), 1e-10)
        dist = 1.0 - xn.T @ xn
    else:  # euclidean
        sq = jnp.sum(jnp.square(X), axis=0)
        dist = jnp.sqrt(jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (X.T @ X), 0.0))

    # exclude a band around the diagonal of half-width `width`
    ij = jnp.abs(jnp.arange(t)[:, None] - jnp.arange(t)[None, :])
    invalid = ij < width
    big = jnp.asarray(jnp.finfo(jnp.float32).max)
    dist_masked = jnp.where(invalid, big, dist)

    # kth smallest distance per row -> threshold
    kth = jnp.sort(dist_masked, axis=1)[:, k - 1 : k]
    link = (dist_masked <= kth) & ~invalid

    # affinity: exp(-dist / sigma), sigma = median of linked distances
    linked_dists = jnp.where(link, dist, jnp.nan)
    sigma = jnp.nanmedian(linked_dists)
    aff = jnp.where(link, jnp.exp(-dist / jnp.maximum(sigma, 1e-10)), 0.0)
    if sym:
        aff = jnp.maximum(aff, aff.T)
    return aff


def timelag_median_filter(R: jax.Array, size: int = 7) -> jax.Array:
    """Median-filter the recurrence matrix along diagonals
    (`rosa/segment.py` timelag filter; reference mir.py:240-242):
    convert to time-lag (skewed) representation, filter along time,
    convert back."""
    t = R.shape[0]
    rows = jnp.arange(t)[:, None]
    cols = jnp.arange(t)[None, :]
    # skew: L[i, lag] = R[i, (i + lag) % t]
    L = R[rows, (rows + jnp.arange(t)[None, :]) % t]
    Lf = _median_filter_axis(L, size, axis=0)
    return Lf[rows, (cols - rows) % t]  # unskew


def kmeans(X: jax.Array, k: int, n_iter: int = 50, key=None) -> Tuple[jax.Array, jax.Array]:
    """Plain Lloyd k-means via lax.scan (`rosa/segment.py:107-130`'s
    differentiable k-means, hard-assignment variant).
    X: (n, d) -> (labels (n,), centers (k, d))."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = X.shape[0]
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centers0 = X[init_idx]

    def step(centers, _):
        d2 = jnp.sum(jnp.square(X[:, None, :] - centers[None]), axis=-1)
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, k)  # (n, k)
        counts = jnp.maximum(onehot.sum(axis=0), 1.0)
        new_centers = (onehot.T @ X) / counts[:, None]
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers0, None, length=n_iter)
    d2 = jnp.sum(jnp.square(X[:, None, :] - centers[None]), axis=-1)
    return jnp.argmin(d2, axis=1), centers


def sync_median(X: jax.Array, boundaries: np.ndarray, n_out: int) -> jax.Array:
    """Aggregate feature frames between boundaries by median
    (librosa.util.sync). Host-side loop over static boundaries."""
    segs = []
    bounds = list(boundaries) + [X.shape[1]]
    for i in range(n_out):
        lo = bounds[i]
        hi = max(bounds[i + 1], lo + 1)
        segs.append(jnp.median(X[:, lo:hi], axis=1))
    return jnp.stack(segs, axis=1)


def laplacian_segmentation(
    y: jax.Array, sr: float, k: int = 5, hop_length: int = 512
) -> Tuple[np.ndarray, np.ndarray]:
    """Pattern-recurrence segmentation (`rosa/segment.py:133-190`;
    reference recipe `audioreactive/mir.py:212-293`):
    CQT -> beat-sync -> recurrence + path affinities -> normalized
    laplacian eigenvectors -> k-means -> (boundary times, labels)."""
    BPO, N_OCT = 12 * 3, 7
    C = amplitude_to_db(spec_abs(cqt(y, sr=sr, hop_length=hop_length, n_bins=N_OCT * BPO, bins_per_octave=BPO)))

    # lightweight beat proxy: pick evenly spaced "beats" from onset peaks
    oe = onset_strength(y, sr=sr, hop_length=hop_length)
    bpm = float(tempo(oe, sr=sr, hop_length=hop_length))
    frames_per_beat = (60.0 / max(bpm, 1e-3)) * sr / hop_length
    n_beats = max(int(C.shape[1] / frames_per_beat), 2 * k)
    beats = np.linspace(0, C.shape[1] - 1, n_beats + 1).astype(int)[:-1]

    Csync = sync_median(C, beats, n_beats)
    R = recurrence_matrix(Csync, width=3, metric="cosine", sym=True)
    Rf = timelag_median_filter(R, size=7)

    M = mfcc(y, sr, hop_length=hop_length)
    Msync = sync_median(M, beats, n_beats)
    path_distance = jnp.sum(jnp.square(jnp.diff(Msync, axis=1)), axis=0)
    sigma = jnp.median(path_distance)
    path_sim = jnp.exp(-path_distance / jnp.maximum(sigma, 1e-10))
    R_path = jnp.diag(path_sim, k=1) + jnp.diag(path_sim, k=-1)

    deg_path = R_path.sum(axis=1)
    deg_rec = Rf.sum(axis=1)
    mu = deg_path @ (deg_path + deg_rec) / jnp.maximum(jnp.sum(jnp.square(deg_path + deg_rec)), 1e-10)
    A = mu * Rf + (1 - mu) * R_path

    deg = A.sum(axis=1)
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-10))
    L = jnp.eye(A.shape[0]) - (dinv[:, None] * A) * dinv[None, :]
    evals, evecs = jnp.linalg.eigh(L)
    evecs = _median_filter_axis(evecs, 9, axis=0)
    Cnorm = jnp.sqrt(jnp.cumsum(jnp.square(evecs), axis=1))
    X = evecs[:, :k] / jnp.maximum(Cnorm[:, k - 1 : k], 1e-10)

    seg_ids, _ = kmeans(X, k)
    seg_ids = np.asarray(seg_ids)

    bound_beats = np.concatenate([[0], 1 + np.flatnonzero(seg_ids[:-1] != seg_ids[1:])])
    bound_segs = seg_ids[bound_beats]
    bound_frames = beats[bound_beats]
    bound_times = bound_frames * hop_length / sr
    bound_times = np.asarray(bound_times, float)
    if len(bound_times) and bound_times[0] != 0:
        bound_times[0] = 0.0
    return bound_times, bound_segs
