"""Sampler correctness tests: with the analytically-optimal denoiser
for a point-mass data distribution, every sampler must integrate to
the target (reference: k-diffusion / guided-diffusion samplers used at
maua/diffusion/processors/stable.py:185-207, guided.py:302-313)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.diffusion import samplers as S

TARGET = None


def make_target():
    return jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32))


def karras_sigmas(n, sigma_min=0.03, sigma_max=10.0, rho=7.0):
    ramp = np.linspace(0, 1, n)
    min_inv, max_inv = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho
    return np.append(sigmas, 0.0).astype(np.float32)


@pytest.mark.parametrize("name", ["euler", "heun", "dpm_2", "lms", "dpmpp_2m"])
def test_deterministic_samplers_converge(name):
    target = make_target()

    def denoiser(x, sigma):
        return jnp.broadcast_to(target, x.shape)

    sigmas = karras_sigmas(20)
    x0 = jax.random.normal(jax.random.PRNGKey(1), target.shape) * sigmas[0]
    out = S.get_sampler(name)(denoiser, x0, sigmas)
    err = float(jnp.abs(out - target).max())
    assert err < 1e-3, (name, err)


@pytest.mark.parametrize("name", ["euler_ancestral", "dpm_2_ancestral"])
def test_ancestral_samplers_converge(name):
    target = make_target()

    def denoiser(x, sigma):
        return jnp.broadcast_to(target, x.shape)

    sigmas = karras_sigmas(25)
    x0 = jax.random.normal(jax.random.PRNGKey(2), target.shape) * sigmas[0]
    out = S.get_sampler(name)(denoiser, x0, sigmas, key=jax.random.PRNGKey(3))
    err = float(jnp.abs(out - target).max())
    assert err < 1e-2, (name, err)


@pytest.mark.parametrize("name", ["dpm_fast", "dpm_adaptive"])
def test_dpm_solver_fast_adaptive_exact_on_linear_ode(name):
    """DPM-Solver's exponential-integrator steps are exact for the
    point-mass denoiser (eps linear in x), so the output must equal
    the analytic ODE solution at sigma_min — the samplers integrate
    over [sigma_max, sigma_min], not to 0 (k-diffusion semantics)."""
    target = make_target()

    def denoiser(x, sigma):
        return jnp.broadcast_to(target, x.shape)

    sigmas = karras_sigmas(20)
    x0 = jax.random.normal(jax.random.PRNGKey(4), target.shape) * sigmas[0]
    out = S.get_sampler(name)(denoiser, x0, sigmas)
    sig_min = sigmas[sigmas > 0][-1]
    exact = target + sig_min * (x0 - target) / sigmas[0]
    err = float(jnp.abs(out - exact).max())
    assert err < 1e-3, (name, err)


def _linear_gaussian_eps(target, alphas_cumprod):
    ac = jnp.asarray(alphas_cumprod, jnp.float32)

    def eps_model(x, t):
        a = ac[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * target) / jnp.sqrt(1 - a)

    return eps_model


def test_ddim_converges():
    target = make_target()
    ac = S.make_ddpm_schedule(1000, schedule="linear")
    timesteps = np.linspace(999, 0, 50).round().astype(int)
    x = jax.random.normal(jax.random.PRNGKey(4), target.shape)
    out, pred = S.ddim_sample_loop(_linear_gaussian_eps(target, ac), x, timesteps, ac)
    assert float(jnp.abs(out - target).max()) < 1e-2


def test_plms_converges():
    target = make_target()
    ac = S.make_ddpm_schedule(1000, schedule="linear")
    timesteps = np.linspace(999, 0, 50).round().astype(int)
    x = jax.random.normal(jax.random.PRNGKey(5), target.shape)
    out, pred = S.plms_sample_loop(_linear_gaussian_eps(target, ac), x, timesteps, ac)
    assert float(jnp.abs(out - target).max()) < 5e-2


def test_q_sample():
    x0 = make_target()
    noise = jnp.zeros_like(x0)
    ac_t = jnp.asarray([0.25, 1.0])
    out = S.q_sample(x0, ac_t, noise)
    assert np.allclose(np.asarray(out[0]), np.asarray(x0[0]) * 0.5, atol=1e-6)
    assert np.allclose(np.asarray(out[1]), np.asarray(x0[1]), atol=1e-6)


def test_heun_more_accurate_than_euler():
    """2nd-order sampler should beat 1st-order on a curved denoiser."""

    def denoiser(x, sigma):  # sigma-dependent shrink: d is non-constant
        s = S.append_dims(sigma, x.ndim)
        return x / (1.0 + s**2)

    sigmas = karras_sigmas(10, sigma_min=0.1, sigma_max=5.0)
    x0 = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 4, 3)) * sigmas[0]
    # reference solution with many euler steps
    ref = S.sample_euler(denoiser, x0, karras_sigmas(400, sigma_min=0.1, sigma_max=5.0))
    e = S.sample_euler(denoiser, x0, sigmas)
    h = S.sample_heun(denoiser, x0, sigmas)
    err_e = float(jnp.abs(e - ref).mean())
    err_h = float(jnp.abs(h - ref).mean())
    assert err_h < err_e
