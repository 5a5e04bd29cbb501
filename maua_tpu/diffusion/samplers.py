"""Diffusion samplers: k-diffusion sigma-space family + DDIM/PLMS,
all expressed as `lax.scan` over steps.

Rebuild of the sampler surface the reference reaches through
k_diffusion (`maua/diffusion/processors/stable.py:185-207`: euler /
euler_ancestral / heun / dpm_2 / dpm_2_ancestral / lms / dpmpp_2m /
dpm_fast / dpm_adaptive) and guided_diffusion
(`processors/guided.py:302-313`: p / ddim / plms), reimplemented from
the published algorithm definitions (Karras et al. 2022; Song et al.
2020; Liu et al. 2022; Lu et al. 2022).

Interface: `denoiser(x, sigma_batch) -> denoised x0 prediction`;
samplers integrate from sigmas[0] to sigmas[-1]. `sigmas` is a host
numpy array (static per compile) so multistep coefficients can be
precomputed exactly.
"""

from __future__ import annotations

import math

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def append_dims(x: jax.Array, n: int) -> jax.Array:
    return x.reshape(x.shape + (1,) * (n - x.ndim))


def to_d(x: jax.Array, sigma: jax.Array, denoised: jax.Array) -> jax.Array:
    return (x - denoised) / append_dims(sigma, x.ndim)


def _ancestral_steps(sigma: np.ndarray, sigma_next: np.ndarray, eta: float = 1.0):
    sigma_up = np.minimum(
        sigma_next, eta * np.sqrt(np.maximum(sigma_next**2 * (sigma**2 - sigma_next**2) / np.maximum(sigma**2, 1e-20), 0))
    )
    sigma_down = np.sqrt(np.maximum(sigma_next**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


def sample_euler(denoiser: Callable, x: jax.Array, sigmas: np.ndarray) -> jax.Array:
    """Karras Algorithm 1 without churn (k_diffusion.sample_euler)."""
    sig = jnp.asarray(sigmas, jnp.float32)

    def step(x, i):
        sigma = sig[i] * jnp.ones(x.shape[0])
        denoised = denoiser(x, sigma)
        d = to_d(x, sigma, denoised)
        x = x + d * (sig[i + 1] - sig[i])
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(len(sigmas) - 1))
    return x


def sample_euler_ancestral(denoiser: Callable, x: jax.Array, sigmas: np.ndarray, key=None, eta: float = 1.0) -> jax.Array:
    if key is None:
        key = jax.random.PRNGKey(0)
    down, up = _ancestral_steps(sigmas[:-1], sigmas[1:], eta)
    down = jnp.asarray(down, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    sig = jnp.asarray(sigmas, jnp.float32)

    def step(carry, i):
        x, k = carry
        k, sub = jax.random.split(k)
        sigma = sig[i] * jnp.ones(x.shape[0])
        denoised = denoiser(x, sigma)
        d = to_d(x, sigma, denoised)
        x = x + d * (down[i] - sig[i])
        x = x + jax.random.normal(sub, x.shape, x.dtype) * up[i]
        return (x, k), None

    (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(len(sigmas) - 1))
    return x


def sample_heun(denoiser: Callable, x: jax.Array, sigmas: np.ndarray) -> jax.Array:
    """Karras Algorithm 1 2nd order (k_diffusion.sample_heun)."""
    sig = jnp.asarray(sigmas, jnp.float32)

    def step(x, i):
        sigma = sig[i] * jnp.ones(x.shape[0])
        denoised = denoiser(x, sigma)
        d = to_d(x, sigma, denoised)
        dt = sig[i + 1] - sig[i]

        def heun_correct(x):
            x_2 = x + d * dt
            sigma_2 = sig[i + 1] * jnp.ones(x.shape[0])
            denoised_2 = denoiser(x_2, sigma_2)
            d_2 = to_d(x_2, sigma_2, denoised_2)
            return x + (d + d_2) / 2 * dt

        x = jax.lax.cond(sig[i + 1] == 0, lambda x: x + d * dt, heun_correct, x)
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(len(sigmas) - 1))
    return x


def sample_dpm_2(denoiser: Callable, x: jax.Array, sigmas: np.ndarray) -> jax.Array:
    """DPM-Solver-2 midpoint in log-sigma (k_diffusion.sample_dpm_2)."""
    sig = jnp.asarray(sigmas, jnp.float32)

    def step(x, i):
        sigma = sig[i] * jnp.ones(x.shape[0])
        denoised = denoiser(x, sigma)
        d = to_d(x, sigma, denoised)

        def mid(x):
            sigma_mid = jnp.exp(0.5 * (jnp.log(sig[i]) + jnp.log(jnp.maximum(sig[i + 1], 1e-10))))
            dt_1 = sigma_mid - sig[i]
            dt_2 = sig[i + 1] - sig[i]
            x_2 = x + d * dt_1
            denoised_2 = denoiser(x_2, sigma_mid * jnp.ones(x.shape[0]))
            d_2 = to_d(x_2, sigma_mid * jnp.ones(x.shape[0]), denoised_2)
            return x + d_2 * dt_2

        x = jax.lax.cond(sig[i + 1] == 0, lambda x: x + d * (sig[i + 1] - sig[i]), mid, x)
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(len(sigmas) - 1))
    return x


def sample_dpm_2_ancestral(denoiser: Callable, x: jax.Array, sigmas: np.ndarray, key=None, eta: float = 1.0) -> jax.Array:
    if key is None:
        key = jax.random.PRNGKey(0)
    down, up = _ancestral_steps(sigmas[:-1], sigmas[1:], eta)
    down = jnp.asarray(down, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    sig = jnp.asarray(sigmas, jnp.float32)

    def step(carry, i):
        x, k = carry
        k, sub = jax.random.split(k)
        sigma = sig[i] * jnp.ones(x.shape[0])
        denoised = denoiser(x, sigma)
        d = to_d(x, sigma, denoised)

        def mid(x):
            sigma_mid = jnp.exp(0.5 * (jnp.log(sig[i]) + jnp.log(jnp.maximum(down[i], 1e-10))))
            dt_1 = sigma_mid - sig[i]
            dt_2 = down[i] - sig[i]
            x_2 = x + d * dt_1
            denoised_2 = denoiser(x_2, sigma_mid * jnp.ones(x.shape[0]))
            d_2 = to_d(x_2, sigma_mid * jnp.ones(x.shape[0]), denoised_2)
            return x + d_2 * dt_2

        x = jax.lax.cond(down[i] == 0, lambda x: x + d * (down[i] - sig[i]), mid, x)
        x = x + jax.random.normal(sub, x.shape, x.dtype) * up[i]
        return (x, k), None

    (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(len(sigmas) - 1))
    return x


def _lms_coefficients(sigmas: np.ndarray, order: int = 4) -> np.ndarray:
    """Integrated Lagrange-polynomial coefficients for LMS
    (k_diffusion.sample_lms linear_multistep_coeff), computed exactly
    on host with quadrature."""
    from scipy import integrate

    n = len(sigmas) - 1
    coeffs = np.zeros((n, order), np.float64)
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            def fn(tau, j=j, i=i, cur_order=cur_order):
                prod = 1.0
                for k in range(cur_order):
                    if k == j:
                        continue
                    prod *= (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
                return prod

            coeffs[i, j] = integrate.quad(fn, sigmas[i], sigmas[i + 1], epsrel=1e-4)[0]
    return coeffs


def sample_lms(denoiser: Callable, x: jax.Array, sigmas: np.ndarray, order: int = 4) -> jax.Array:
    """(k_diffusion.sample_lms)"""
    coeffs = jnp.asarray(_lms_coefficients(np.asarray(sigmas, np.float64), order), jnp.float32)
    sig = jnp.asarray(sigmas, jnp.float32)
    d_hist0 = jnp.zeros((order,) + x.shape, x.dtype)

    def step(carry, i):
        x, d_hist = carry
        sigma = sig[i] * jnp.ones(x.shape[0])
        denoised = denoiser(x, sigma)
        d = to_d(x, sigma, denoised)
        d_hist = jnp.roll(d_hist, 1, axis=0).at[0].set(d)
        delta = jnp.einsum("j,j...->...", coeffs[i], d_hist)
        return (x + delta, d_hist), None

    (x, _), _ = jax.lax.scan(step, (x, d_hist0), jnp.arange(len(sigmas) - 1))
    return x


def sample_dpmpp_2m(denoiser: Callable, x: jax.Array, sigmas: np.ndarray) -> jax.Array:
    """DPM-Solver++(2M) (k_diffusion.sample_dpmpp_2m)."""
    sig = np.asarray(sigmas, np.float64)
    t_fn = lambda s: -np.log(np.maximum(s, 1e-20))
    sigl = jnp.asarray(sigmas, jnp.float32)

    hs = []
    h_lasts = [0.0]
    for i in range(len(sig) - 1):
        h = t_fn(sig[i + 1]) - t_fn(sig[i])
        hs.append(h)
        h_lasts.append(h)
    hs_arr = jnp.asarray(hs, jnp.float32)
    h_last_arr = jnp.asarray(h_lasts[:-1], jnp.float32)

    def step(carry, i):
        x, old_denoised = carry
        sigma = sigl[i] * jnp.ones(x.shape[0])
        denoised = denoiser(x, sigma)
        h = hs_arr[i]
        ratio = sigl[i + 1] / sigl[i]

        def first_or_final(args):
            x, denoised, _ = args
            return x * ratio - jnp.expm1(-h) * denoised

        def multistep(args):
            x, denoised, old_denoised = args
            r = h_last_arr[i] / h
            denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            return x * ratio - jnp.expm1(-h) * denoised_d

        use_multi = jnp.logical_and(i > 0, sigl[i + 1] != 0)
        x = jax.lax.cond(use_multi, multistep, first_or_final, (x, denoised, old_denoised))
        return (x, denoised), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), jnp.arange(len(sigmas) - 1))
    return x


# ------------------------------------------------ DPM-Solver fast/adaptive
# Exponential-integrator steps from Lu et al. 2022 (DPM-Solver) in the
# k-diffusion sigma parameterization: t = -ln(sigma), sigma(t) = e^-t,
# eps(x, t) = (x - denoised) / sigma. The reference exposes these as
# the `dpm_fast` / `dpm_adaptive` sampler choices
# (`maua/diffusion/image.py:302`).


def _dpm_eps(denoiser, x, t):
    sigma = jnp.exp(-t)
    denoised = denoiser(x, sigma * jnp.ones(x.shape[0]))
    return (x - denoised) / sigma


def _dpm_1_step(denoiser, x, t, t_next, eps):
    h = t_next - t
    return x - jnp.exp(-t_next) * jnp.expm1(h) * eps


def _dpm_2_step(denoiser, x, t, t_next, eps, r1=0.5):
    h = t_next - t
    s1 = t + r1 * h
    u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
    eps1 = _dpm_eps(denoiser, u1, s1)
    return x - jnp.exp(-t_next) * (jnp.expm1(h) * eps + jnp.expm1(h) / (2 * r1) * (eps1 - eps))


def _dpm_3_step(denoiser, x, t, t_next, eps, r1=1.0 / 3, r2=2.0 / 3):
    h = t_next - t
    s1, s2 = t + r1 * h, t + r2 * h
    u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
    eps1 = _dpm_eps(denoiser, u1, s1)
    u2 = x - jnp.exp(-s2) * (
        jnp.expm1(r2 * h) * eps + (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1) * (eps1 - eps)
    )
    eps2 = _dpm_eps(denoiser, u2, s2)
    return x - jnp.exp(-t_next) * (jnp.expm1(h) * eps + (jnp.expm1(h) / h - 1) / r2 * (eps2 - eps))


def sample_dpm_fast(denoiser: Callable, x: jax.Array, sigmas: np.ndarray) -> jax.Array:
    """DPM-Solver fast: the model-call budget n = len(sigmas)-1 is
    spent on 3rd-order steps over uniform t segments, with a 2nd/1st
    order tail when n is not a multiple of 3 (paper section 3.4)."""
    sig = np.asarray(sigmas, np.float64)
    nz = sig[sig > 0]
    n = max(len(sig) - 1, 1)
    t_start, t_end = -np.log(nz[0]), -np.log(nz[-1])
    m = n // 3 + 1
    if n % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [n % 3]
    ts = np.linspace(t_start, t_end, len(orders) + 1)
    for i, order in enumerate(orders):
        t, t_next = jnp.float32(ts[i]), jnp.float32(ts[i + 1])
        eps = _dpm_eps(denoiser, x, t)
        step = {1: _dpm_1_step, 2: _dpm_2_step, 3: _dpm_3_step}[order]
        x = step(denoiser, x, t, t_next, eps)
    return x


def sample_dpm_adaptive(
    denoiser: Callable,
    x: jax.Array,
    sigmas: np.ndarray,
    order: int = 3,
    rtol: float = 0.05,
    atol: float = 0.0078,
    h_init: float = 0.05,
    accept_safety: float = 0.81,
    max_steps: int = 200,
) -> jax.Array:
    """DPM-Solver-23 with adaptive step size (paper appendix: embedded
    lower-order estimate for the local error, integral step-size
    control with a soft arctan limiter). Runs as a lax.while_loop, so
    the number of model calls is data-dependent; sigmas only provides
    the integration range."""
    sig = np.asarray(sigmas, np.float64)
    nz = sig[sig > 0]
    t_start, t_end = float(-np.log(nz[0])), float(-np.log(nz[-1]))
    n_el = float(np.prod(x.shape))

    def body(carry):
        x, s, h, inv_e1, inv_e2, steps = carry
        t_next = jnp.minimum(t_end, s + h)
        eps = _dpm_eps(denoiser, x, s)
        if order == 2:
            x_low = _dpm_1_step(denoiser, x, s, t_next, eps)
            x_high = _dpm_2_step(denoiser, x, s, t_next, eps)
        else:
            x_low = _dpm_2_step(denoiser, x, s, t_next, eps, r1=1.0 / 3)
            x_high = _dpm_3_step(denoiser, x, s, t_next, eps)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_high)))
        err = jnp.sqrt(jnp.sum(jnp.square((x_low - x_high) / delta)) / n_el)
        inv_e0 = 1.0 / (err + 1e-8)
        factor = 1.0 + jnp.arctan(inv_e0 ** (1.0 / order) - 1.0)  # soft limiter
        accept = factor >= accept_safety
        x = jnp.where(accept, x_high, x)
        s = jnp.where(accept, t_next, s)
        inv_e2 = jnp.where(accept, inv_e1, inv_e2)
        inv_e1 = jnp.where(accept, inv_e0, inv_e1)
        return (x, s, h * factor, inv_e1, inv_e2, steps + 1)

    def cond(carry):
        _, s, _, _, _, steps = carry
        return jnp.logical_and(s < t_end - 1e-5, steps < max_steps)

    init = (x, jnp.float32(t_start), jnp.float32(h_init), jnp.float32(1.0), jnp.float32(1.0), jnp.int32(0))
    x, *_ = jax.lax.while_loop(cond, body, init)
    return x


SAMPLERS = {
    "euler": sample_euler,
    "euler_ancestral": sample_euler_ancestral,
    "heun": sample_heun,
    "dpm_2": sample_dpm_2,
    "dpm_2_ancestral": sample_dpm_2_ancestral,
    "lms": sample_lms,
    "dpmpp_2m": sample_dpmpp_2m,
    "dpm_fast": sample_dpm_fast,
    "dpm_adaptive": sample_dpm_adaptive,
}


def get_sampler(name: str) -> Callable:
    """(`stable.py:185-207` getattr(k_diffusion.sampling, ...))"""
    if name not in SAMPLERS:
        raise ValueError(f"unknown sampler {name}; options: {sorted(SAMPLERS)}")
    return SAMPLERS[name]


# -------------------------------------------------- alpha-space samplers
def make_ddpm_schedule(n_timesteps: int = 1000, beta_start: float = 0.00085 ** 0.5, beta_end: float = 0.012 ** 0.5,
                       schedule: str = "scaled_linear") -> np.ndarray:
    """alphas_cumprod of the base discrete schedule (CompVis scaled
    linear by default; 'linear' = guided-diffusion linear)."""
    if schedule == "scaled_linear":
        betas = np.linspace(beta_start, beta_end, n_timesteps, dtype=np.float64) ** 2
    elif schedule == "linear":
        scale = 1000 / n_timesteps
        betas = np.linspace(scale * 0.0001, scale * 0.02, n_timesteps, dtype=np.float64)
    elif schedule == "cosine":
        t = np.arange(n_timesteps + 1) / n_timesteps
        f = np.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = np.clip(1 - f[1:] / f[:-1], 0, 0.999)
    else:
        raise ValueError(schedule)
    return np.cumprod(1.0 - betas)


def ddim_sample_loop(
    eps_model: Callable,  # eps(x, t_int_batch) -> eps prediction
    x: jax.Array,
    timesteps: np.ndarray,  # decreasing ints, e.g. [980, 960, ..., 0]
    alphas_cumprod: np.ndarray,
    eta: float = 0.0,
    key=None,
    clip_denoised: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """DDIM (Song et al. 2020; guided_diffusion ddim_sample as used at
    `processors/guided.py:305-308`). Returns (x, pred_x0).
    clip_denoised clamps pred_x0 to [-1, 1] each step (guided-diffusion
    default for image-space models) and re-derives eps from it."""
    if key is None:
        key = jax.random.PRNGKey(0)
    ac = jnp.asarray(alphas_cumprod, jnp.float32)
    ts = jnp.asarray(timesteps, jnp.int32)
    ac_next = jnp.concatenate([ac[jnp.asarray(timesteps[1:], jnp.int32)], jnp.ones(1)])

    def step(carry, i):
        x, k, _ = carry
        k, sub = jax.random.split(k)
        t = ts[i] * jnp.ones(x.shape[0], jnp.int32)
        a_t = ac[ts[i]]
        a_next = ac_next[i]
        eps = eps_model(x, t)
        pred_x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        if clip_denoised:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            eps = (x - jnp.sqrt(a_t) * pred_x0) / jnp.sqrt(1 - a_t)
        sigma = (
            eta * jnp.sqrt((1 - a_next) / (1 - a_t)) * jnp.sqrt(1 - a_t / jnp.maximum(a_next, 1e-10))
        )
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.sqrt(a_next) * pred_x0 + jnp.sqrt(jnp.maximum(1 - a_next - sigma**2, 0.0)) * eps + sigma * noise
        return (x, k, pred_x0), None

    (x, _, pred), _ = jax.lax.scan(step, (x, key, jnp.zeros_like(x)), jnp.arange(len(timesteps)))
    return x, pred


def plms_sample_loop(
    eps_model: Callable,
    x: jax.Array,
    timesteps: np.ndarray,
    alphas_cumprod: np.ndarray,
    clip_denoised: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """PLMS / PNDM (Liu et al. 2022) 4th-order linear multistep on eps
    (`processors/guided.py:309-311` plms_sample)."""
    ac = jnp.asarray(alphas_cumprod, jnp.float32)
    ts = jnp.asarray(timesteps, jnp.int32)
    ac_next = jnp.concatenate([ac[jnp.asarray(timesteps[1:], jnp.int32)], jnp.ones(1)])

    def transfer(x, eps, a_t, a_next):
        pred_x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        if clip_denoised:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            eps = (x - jnp.sqrt(a_t) * pred_x0) / jnp.sqrt(1 - a_t)
        return jnp.sqrt(a_next) * pred_x0 + jnp.sqrt(1 - a_next) * eps, pred_x0

    def step(carry, i):
        x, eps_hist, n_hist = carry
        t = ts[i] * jnp.ones(x.shape[0], jnp.int32)
        a_t, a_next = ac[ts[i]], ac_next[i]
        eps = eps_model(x, t)

        def order1(_):
            # pseudo improved Euler startup
            x_mid, _ = transfer(x, eps, a_t, a_next)
            eps_2 = eps_model(x_mid, ts[jnp.minimum(i + 1, len(timesteps) - 1)] * jnp.ones(x.shape[0], jnp.int32))
            return (eps + eps_2) / 2

        def order2(_):
            return (3 * eps - eps_hist[0]) / 2

        def order3(_):
            return (23 * eps - 16 * eps_hist[0] + 5 * eps_hist[1]) / 12

        def order4(_):
            return (55 * eps - 59 * eps_hist[0] + 37 * eps_hist[1] - 9 * eps_hist[2]) / 24

        eps_prime = jax.lax.switch(jnp.minimum(n_hist, 3), [order1, order2, order3, order4], None)
        x_new, pred_x0 = transfer(x, eps_prime, a_t, a_next)
        eps_hist = jnp.roll(eps_hist, 1, axis=0).at[0].set(eps)
        return (x_new, eps_hist, n_hist + 1), pred_x0

    eps_hist0 = jnp.zeros((3,) + x.shape, x.dtype)
    (x, _, _), preds = jax.lax.scan(step, (x, eps_hist0, jnp.int32(0)), jnp.arange(len(timesteps)))
    return x, preds[-1]


def q_sample(x0: jax.Array, alphas_cumprod_t: jax.Array, noise: jax.Array) -> jax.Array:
    """Forward diffusion q(x_t | x_0)."""
    a = append_dims(jnp.sqrt(alphas_cumprod_t), x0.ndim)
    s = append_dims(jnp.sqrt(1 - alphas_cumprod_t), x0.ndim)
    return a * x0 + s * noise
