"""Style/guidance losses + gradient-surgery transforms.

Rebuild of `maua/loss.py` (scaled_mse_loss :33-36, feature_loss
:39-52, gram_matrix :55-78, spherical_dist_loss :81-84, tv_loss
:87-91, range_loss :94-95; gradient ops NormalizeGradients :8-20,
ReplaceGrad :102-113, ClampWithGrad :116-130 become custom_vjp
functions — the JAX-native form of autograd.Function).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scaled_mse_loss(x: jax.Array, y: jax.Array, eps: float = 1e-8) -> jax.Array:
    """MSE scaled inversely with magnitude (`maua/loss.py:33-36`)."""
    diff = x - y
    return jnp.mean(jnp.square(diff)) / jnp.sqrt(jnp.mean(jnp.square(y)) + eps)


def feature_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """(`maua/loss.py:39-52`)"""
    return scaled_mse_loss(x, y)


def gram_matrix(x: jax.Array, shift_x: int = 0, shift_y: int = 0, shift_t: int = 0,
                flip_h: bool = False, flip_v: bool = False, use_covariance: bool = False) -> jax.Array:
    """Gram/covariance matrix of NHWC features with optional
    transport shifts (`maua/loss.py:55-78`)."""
    b, h, w, c = x.shape
    y = x
    if shift_x or shift_y:
        y = jnp.roll(jnp.roll(y, shift_x, axis=2), shift_y, axis=1)
        x = x[:, abs(shift_y):, abs(shift_x):, :]
        y = y[:, abs(shift_y):, abs(shift_x):, :]
    if flip_h:
        y = y[:, :, ::-1, :]
    if flip_v:
        y = y[:, ::-1, :, :]
    xf = x.reshape(b, -1, c)
    yf = y.reshape(b, -1, c)
    if use_covariance:
        xf = xf - xf.mean(axis=1, keepdims=True)
        yf = yf - yf.mean(axis=1, keepdims=True)
    return jnp.einsum("bnc,bnd->bcd", xf, yf) / xf.shape[1]


def spherical_dist_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """(`maua/loss.py:81-84`)"""
    xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    yn = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.square(jnp.arcsin(jnp.clip(jnp.linalg.norm(xn - yn, axis=-1) / 2, -1, 1))) * 2


def tv_loss(x: jax.Array) -> jax.Array:
    """Isotropic total variation of NHWC images (`maua/loss.py:87-91`)."""
    x_diff = x[:, :-1, 1:, :] - x[:, :-1, :-1, :]
    y_diff = x[:, 1:, :-1, :] - x[:, :-1, :-1, :]
    return jnp.mean(jnp.square(x_diff) + jnp.square(y_diff))


def range_loss(x: jax.Array) -> jax.Array:
    """(`maua/loss.py:94-95`)"""
    return jnp.mean(jnp.square(jnp.abs(x) - jnp.clip(x, -1, 1)))


# ------------------------------------------------ gradient surgery ops
@jax.custom_vjp
def normalize_gradients(x, strength=1.0):
    return x


def _ng_fwd(x, strength):
    return x, strength


def _ng_bwd(strength, g):
    # unit-normalize the incoming gradient, scaled by |strength|
    # (`maua/loss.py:8-20`)
    norm = jnp.sqrt(jnp.sum(jnp.square(g)))
    g = g / jnp.maximum(norm, 1e-12) * jnp.abs(jnp.asarray(strength))
    return g, None


normalize_gradients.defvjp(_ng_fwd, _ng_bwd)


@jax.custom_vjp
def replace_grad(x_forward, x_backward):
    """Forward x_forward, backprop into x_backward
    (`maua/loss.py:102-113`)."""
    return x_forward


def _rg_fwd(x_forward, x_backward):
    return x_forward, None


def _rg_bwd(_, g):
    return None, g


replace_grad.defvjp(_rg_fwd, _rg_bwd)


@jax.custom_vjp
def clamp_with_grad(x, lo=-1.0, hi=1.0):
    """Clamp forward; straight-through-ish backward that zeroes
    gradients pushing further out of range (`maua/loss.py:116-130`)."""
    return jnp.clip(x, lo, hi)


def _cg_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), (x, lo, hi)


def _cg_bwd(res, g):
    x, lo, hi = res
    inside = (x >= lo) & (x <= hi)
    pushing_in = ((x < lo) & (g < 0)) | ((x > hi) & (g > 0))
    return (jnp.where(inside | pushing_in, g, 0.0), None, None)


clamp_with_grad.defvjp(_cg_fwd, _cg_bwd)
