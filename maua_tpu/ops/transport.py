"""Sliced optimal transport and histogram matching toolkit.

Role of `maua/GAN/training/models/experimental/optstyle/optimal_transport.py`:
random SO(N) rotations (:12-28), per-channel CDF histogram matching
(:113-147), covariance color transfer in cholesky / PCA / symmetric
modes (:44-91), and the sliced-OT iteration built from them (:31-41).
Everything here is jittable: histograms are scatter-adds over
dynamically-scaled bins, CDF remapping is `jnp.interp`, and the
rotation comes from a QR decomposition instead of the reference's
sequential Householder construction (same Haar distribution on SO(N)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def random_rotation(key, n: int) -> jax.Array:
    """Haar-random SO(n) matrix (det +1, inverse = transpose)."""
    a = jax.random.normal(key, (n, n))
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    # force det +1 by flipping one axis when the reflection part is odd
    det = jnp.linalg.det(q)
    return q.at[:, -1].multiply(jnp.sign(det))


@partial(jax.jit, static_argnames=("bins",))
def cdf_match(target: jax.Array, source: jax.Array, bins: int = 256) -> jax.Array:
    """Per-channel CDF histogram matching: remap `target` values so its
    per-channel empirical distribution matches `source`'s.

    target (..., C), source (..., C); returns target's shape. The role
    of the reference's `cdf_match` (:113-147), vectorized over channels
    (the reference loops channels with `torch.histc`)."""
    c = target.shape[-1]
    t = target.reshape(-1, c).T.astype(jnp.float32)  # (C, Nt)
    s = source.reshape(-1, c).T.astype(jnp.float32)  # (C, Ns)

    def one_channel(tc, sc):
        lo = jnp.minimum(tc.min(), sc.min())
        hi = jnp.maximum(tc.max(), sc.max())
        span = jnp.maximum(hi - lo, 1e-12)
        edges = lo + span * jnp.linspace(0.0, 1.0, bins + 1)[1:]

        def hist(x):
            idx = jnp.clip(((x - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
            return jnp.zeros(bins, jnp.float32).at[idx].add(1.0)

        t_cdf = jnp.cumsum(hist(tc))
        t_cdf = t_cdf / t_cdf[-1]
        s_cdf = jnp.cumsum(hist(sc))
        s_cdf = s_cdf / s_cdf[-1]
        remapped = jnp.interp(t_cdf, s_cdf, edges)
        return jnp.interp(tc, edges, remapped)

    out = jax.vmap(one_channel)(t, s).T.reshape(target.shape)
    return jnp.clip(out, target.min(), target.max()).astype(target.dtype)


def _cov(x: jax.Array, eps: float) -> jax.Array:
    """(C, N) centered features -> (C, C) covariance + eps*I."""
    return x @ x.T / x.shape[1] + eps * jnp.eye(x.shape[0], dtype=x.dtype)


def _psd_sqrt(c: jax.Array) -> jax.Array:
    eva, eve = jnp.linalg.eigh(c)
    return eve @ jnp.diag(jnp.sqrt(jnp.maximum(eva, 0.0))) @ eve.T


def hist_match(target: jax.Array, source: jax.Array, mode: str = "cdf", eps: float = 1e-2) -> jax.Array:
    """Match target's per-channel statistics to source's.

    target/source are (..., C). Modes (the reference's `hist_match`
    :44-91): 'cdf' full per-channel CDF remap; 'chol'/'pca'/'sym'
    second-moment (covariance) color transfer via cholesky, PCA
    whitening, or the symmetric Monge map."""
    if mode == "cdf":
        return cdf_match(target, source)

    c = target.shape[-1]
    t = target.reshape(-1, c).T.astype(jnp.float32)
    s = source.reshape(-1, c).T.astype(jnp.float32)
    mu_t = t.mean(axis=1, keepdims=True)
    mu_s = s.mean(axis=1, keepdims=True)
    cov_t = _cov(t - mu_t, eps)
    cov_s = _cov(s - mu_s, eps)

    if mode == "chol":
        chol_t = jnp.linalg.cholesky(cov_t)
        chol_s = jnp.linalg.cholesky(cov_s)
        matched = chol_s @ jnp.linalg.inv(chol_t) @ (t - mu_t)
    elif mode == "pca":
        qt = _psd_sqrt(cov_t)
        qs = _psd_sqrt(cov_s)
        matched = qs @ jnp.linalg.inv(qt) @ (t - mu_t)
    elif mode == "sym":
        qt = _psd_sqrt(cov_t)
        qt_inv = jnp.linalg.inv(qt)
        middle = _psd_sqrt(qt @ cov_s @ qt)
        matched = qt_inv @ middle @ qt_inv @ (t - mu_t)
    else:
        raise ValueError(f"unknown hist_match mode {mode!r}")
    return (matched + mu_s).T.reshape(target.shape).astype(target.dtype)


def sliced_histogram_transport(source: jax.Array, target: jax.Array, iters: int = 8, key=None) -> jax.Array:
    """Iterative sliced-OT color transfer (`optimal_transport.py:31-41`):
    rotate channels by a random SO(C) basis, CDF-match per rotated
    channel, rotate back; repeat. source/target are (..., C)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    c = source.shape[-1]
    for k in jax.random.split(key, iters):
        rot = random_rotation(k, c)
        source = cdf_match(source @ rot, target @ rot) @ rot.T
    return source
