"""Denoiser wrappers: discrete eps-models exposed in Karras
sigma-space (the k_diffusion.external.CompVisDenoiser role from
`maua/diffusion/processors/stable.py:185-207`).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .samplers import append_dims


class DiscreteSchedule:
    """sigma <-> timestep maps over a discrete alphas_cumprod table."""

    def __init__(self, alphas_cumprod: np.ndarray):
        self.alphas_cumprod = np.asarray(alphas_cumprod, np.float64)
        self.sigmas_table = np.sqrt((1 - self.alphas_cumprod) / self.alphas_cumprod)
        self.log_sigmas = np.log(self.sigmas_table)

    def get_sigmas(self, n: int) -> np.ndarray:
        """n+1 descending sigmas ending in 0 (k-diffusion
        DiscreteSchedule.get_sigmas)."""
        t_max = len(self.sigmas_table) - 1
        t = np.linspace(t_max, 0, n)
        low = np.floor(t).astype(int)
        high = np.ceil(t).astype(int)
        w = t - low
        log_s = (1 - w) * self.log_sigmas[low] + w * self.log_sigmas[high]
        return np.append(np.exp(log_s), 0.0).astype(np.float32)

    def sigma_to_t(self, sigma: jax.Array) -> jax.Array:
        """Fractional timestep for a sigma (log-space interpolation)."""
        log_sigma = jnp.log(jnp.maximum(sigma, 1e-10))
        ls = jnp.asarray(self.log_sigmas, jnp.float32)
        dists = log_sigma[..., None] - ls[None]
        low_idx = jnp.clip(jnp.sum(dists >= 0, axis=-1) - 1, 0, len(self.log_sigmas) - 2)
        high_idx = low_idx + 1
        low, high = ls[low_idx], ls[high_idx]
        w = jnp.clip((low - log_sigma) / (low - high), 0, 1)
        return (1 - w) * low_idx + w * high_idx


class EpsDenoiser(DiscreteSchedule):
    """eps-prediction model -> denoised-x0 interface
    (CompVisDenoiser semantics): denoised = x - eps(x * c_in, t) * sigma
    with c_in = 1/sqrt(sigma^2 + 1)."""

    def __init__(self, eps_model: Callable, alphas_cumprod: np.ndarray):
        super().__init__(alphas_cumprod)
        self.eps_model = eps_model

    def __call__(self, x: jax.Array, sigma: jax.Array, **kwargs) -> jax.Array:
        c_in = append_dims(1.0 / jnp.sqrt(sigma**2 + 1.0), x.ndim)
        t = self.sigma_to_t(sigma)
        eps = self.eps_model(x * c_in, t, **kwargs)
        return x - eps * append_dims(sigma, x.ndim)


class VDenoiser(DiscreteSchedule):
    """v-prediction model -> denoised interface."""

    def __init__(self, v_model: Callable, alphas_cumprod: np.ndarray):
        super().__init__(alphas_cumprod)
        self.v_model = v_model

    def __call__(self, x: jax.Array, sigma: jax.Array, **kwargs) -> jax.Array:
        c_in = append_dims(1.0 / jnp.sqrt(sigma**2 + 1.0), x.ndim)
        c_out = append_dims(sigma / jnp.sqrt(sigma**2 + 1.0), x.ndim)
        c_skip = append_dims(1.0 / (sigma**2 + 1.0), x.ndim)
        t = self.sigma_to_t(sigma)
        v = self.v_model(x * c_in, t, **kwargs)
        return x * c_skip - v * c_out


def cfg_denoiser(denoiser: Callable, cond, uncond, cond_scale: float) -> Callable:
    """Classifier-free guidance as one 2x-batched eval
    (`stable.py:274-279` cfg_forward)."""

    def model_fn(x, sigma):
        b = x.shape[0]
        x_in = jnp.concatenate([x, x])
        sigma_in = jnp.concatenate([sigma, sigma])
        ctx = jnp.concatenate([jnp.broadcast_to(uncond, (b,) + uncond.shape[1:]),
                               jnp.broadcast_to(cond, (b,) + cond.shape[1:])])
        out = denoiser(x_in, sigma_in, context=ctx)
        un, co = out[:b], out[b:]
        return un + (co - un) * cond_scale

    return model_fn


def guided_denoiser(model_fn: Callable, cond_fn: Callable) -> Callable:
    """Add score guidance: denoised + grad * sigma^2
    (`stable.py:282-291` conditioning_wrapper), with the autograd
    handled by jax.vjp instead of enable_grad blocks."""

    def guided(x, sigma):
        denoised, vjp = jax.vjp(lambda xx: model_fn(xx, sigma), x)
        grad = cond_fn(x, sigma, denoised, vjp)
        return jax.lax.stop_gradient(denoised) + grad * append_dims(sigma**2, x.ndim)

    return guided
