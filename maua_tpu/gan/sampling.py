"""Latent sampling strategies: random, DDLS Langevin, polarity,
Jacobian-norm rejection.

Rebuild of `maua/GAN/sampling/` (dispatch `__init__.py:9`, DDLS
Langevin `langevin.py:26-63+`, polarity SVD `polarity.py:21-61`,
Jacobian-norm rejection `jacnorm.py:14`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


from . import stylegan2 as sg2


def random_latents(key, n: int, z_dim: int = 512) -> jax.Array:
    return jax.random.normal(key, (n, z_dim))


def langevin_sample(
    key,
    n: int,
    energy_fn: Callable,  # z -> scalar energy per sample (e.g. -D(G(z)))
    z_dim: int = 512,
    n_steps: int = 50,
    step_size: float = 0.01,
    noise_scale: float = 0.1,
) -> jax.Array:
    """Discriminator-driven Langevin dynamics (DDLS,
    `sampling/langevin.py:26-63`): z_{t+1} = z_t - e/2 * dE/dz + sqrt(e) * N."""
    k0, kz = jax.random.split(key)
    z = jax.random.normal(kz, (n, z_dim))
    grad_fn = jax.grad(lambda z: jnp.sum(energy_fn(z) + 0.5 * jnp.sum(jnp.square(z), axis=-1)))

    def body(carry, k):
        z = carry
        g = grad_fn(z)
        z = z - 0.5 * step_size * g + noise_scale * jnp.sqrt(step_size) * jax.random.normal(k, z.shape)
        return z, None

    keys = jax.random.split(k0, n_steps)
    z, _ = jax.lax.scan(body, z, keys)
    return z


def polarity_sample(
    key,
    n: int,
    params,
    cfg: sg2.SG2Config,
    n_probe: int = 256,
    polarity: float = 1.0,
) -> jax.Array:
    """Polarity sampling (`sampling/polarity.py:21-61`): reweight
    latents by the singular-value volume of mapped features, biasing
    toward modes (negative polarity) or anti-modes (positive)."""
    kp, ks = jax.random.split(key)
    z = jax.random.normal(kp, (n_probe, cfg.z_dim))
    ws = sg2.mapping(params, z, cfg)[:, 0]  # (n_probe, w_dim)
    # per-sample jacobian volume proxy: product of top singular values
    # of the local feature covariance around each w
    centered = ws - ws.mean(0)
    _, s, vt = jnp.linalg.svd(centered, full_matrices=False)
    proj = centered @ vt.T  # (n_probe, k)
    logvol = jnp.sum(jnp.log(jnp.abs(proj[:, :8]) + 1e-6), axis=1)
    weights = jax.nn.softmax(polarity * logvol)
    idx = jax.random.choice(ks, n_probe, (n,), p=weights, replace=True)
    return z[idx]


def jacnorm_sample(
    key,
    n: int,
    params,
    cfg: sg2.SG2Config,
    percentile: float = 50.0,
    oversample: int = 4,
) -> jax.Array:
    """Jacobian-norm rejection sampling (`sampling/jacnorm.py:14`):
    keep latents whose mapping-Jacobian norm is below the percentile
    (smoother latent regions)."""
    kz, kv = jax.random.split(key)
    z = jax.random.normal(kz, (n * oversample, cfg.z_dim))

    def jac_norm(z_single):
        v = jax.random.normal(kv, z_single.shape)
        _, jvp = jax.jvp(lambda zz: sg2.mapping(params, zz[None], cfg)[:, 0, :], (z_single,), (v,))
        return jnp.linalg.norm(jvp)

    norms = jax.vmap(jac_norm)(z)
    cutoff = jnp.percentile(norms, percentile)
    order = jnp.argsort(jnp.where(norms <= cutoff, 0.0, 1.0) + norms * 1e-6)
    return z[order[:n]]


def discriminator_energy(generator, d_params, d_cfg) -> Callable:
    """DDLS energy from a trained discriminator
    (`sampling/langevin.py:26-63`): E(z) = -D(G(z)); langevin_sample
    adds the N(0, I) prior term itself."""
    from . import discriminator as D

    g_params, g_cfg = generator.params, generator.cfg

    def energy(z):
        ws = sg2.mapping(g_params, z, g_cfg)
        img = sg2.synthesis(g_params, ws, g_cfg)
        if img.shape[1] != d_cfg.img_resolution:
            img = jax.image.resize(
                img, (img.shape[0], d_cfg.img_resolution, d_cfg.img_resolution, img.shape[3]), "bilinear"
            )
        return -D.discriminator(d_params, img, d_cfg)[:, 0]

    return energy


def clip_energy(generator, text: str, perceptor=None) -> Callable:
    """CLIP-guided langevin energy (the reference's text-critic mode of
    `--langevin_critic`): E(z) = -sim(CLIP(G(z)), CLIP(text))."""
    if perceptor is None:
        from ..perceptors.clip import CLIPPerceptor

        perceptor = CLIPPerceptor()
    temb = perceptor.encode_text([text])  # (1, d)
    g_params, g_cfg = generator.params, generator.cfg

    def energy(z):
        ws = sg2.mapping(g_params, z, g_cfg)
        img = sg2.synthesis(g_params, ws, g_cfg)
        emb = perceptor.encode_image((img.astype(jnp.float32) + 1.0) / 2.0)
        return -10.0 * jnp.sum(emb * temb, axis=-1)

    return energy


def make_langevin_energy(generator, critic: str = "discriminator") -> Callable:
    """Resolve the reference's `--langevin_critic` string: 'discriminator'
    loads D from the generator's checkpoint for standard DDLS; anything
    else is treated as a text prompt for CLIP-guided sampling
    (`GAN/generate_images.py:62`)."""
    if critic == "discriminator":
        from .load import load_discriminator

        model_file = getattr(generator, "model_file", None)
        if not model_file:
            raise ValueError(
                "langevin_critic='discriminator' needs the generator's checkpoint file "
                "(with a D entry); pass a text prompt critic instead, or an explicit energy_fn"
            )
        d_params, d_cfg = load_discriminator(model_file)
        return discriminator_energy(generator, d_params, d_cfg)
    return clip_energy(generator, critic)


def sample_latents(strategy: str, key, n: int, params=None, cfg: Optional[sg2.SG2Config] = None,
                   generator=None, critic: str = "discriminator", **kwargs) -> jax.Array:
    """(`sampling/__init__.py:9`)"""
    if strategy == "random":
        return random_latents(key, n, kwargs.get("z_dim", cfg.z_dim if cfg else 512))
    if strategy == "langevin":
        if "energy_fn" not in kwargs:
            if generator is None:
                raise ValueError("langevin sampling needs an energy_fn or a generator to build one from")
            kwargs["energy_fn"] = make_langevin_energy(generator, critic)
        kwargs.setdefault("z_dim", cfg.z_dim if cfg else 512)
        return langevin_sample(key, n, **kwargs)
    if strategy == "polarity":
        return polarity_sample(key, n, params, cfg, **kwargs)
    if strategy == "jacnorm":
        return jacnorm_sample(key, n, params, cfg, **kwargs)
    raise ValueError(f"unknown sampling strategy {strategy}")
