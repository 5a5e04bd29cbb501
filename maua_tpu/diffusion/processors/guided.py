"""Guided-diffusion processor: pixel-space UNet + gradient guidance
through the secondary v-objective model.

Rebuild of `maua/diffusion/processors/guided.py` (GuidedDiffusion
:277-339, GradientGuidedConditioning :236-274, samplers :302-313).
Guidance autograd goes through jax.vjp; the 'fast' speed mode uses the
secondary model's x0 prediction exactly like the reference
(:253-256 including its odd img blend).
"""

from __future__ import annotations


from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import secondary as secondary_mod
from ..models import unet as unet_mod
from ..samplers import ddim_sample_loop, make_ddpm_schedule, plms_sample_loop, q_sample
from .base import BaseDiffusionProcessor


def respaced_timesteps(num_timesteps: int, respacing: str) -> np.ndarray:
    """guided-diffusion space_timesteps: 'N' or 'ddimN' -> ascending
    original-timestep indices."""
    if respacing.startswith("ddim"):
        n = int(respacing[len("ddim"):])
        stride = num_timesteps // n
        return np.arange(0, num_timesteps, stride)[:n]
    n = int(respacing)
    return np.linspace(0, num_timesteps - 1, n).round().astype(int)


class GradientGuidedConditioning:
    """(`guided.py:236-274`)"""

    def __init__(self, alphas_cumprod: np.ndarray, secondary_params, grad_modules, speed: str = "fast"):
        self.speed = speed
        self.secondary_params = secondary_params
        self.grad_modules = list(grad_modules)
        self.sqrt_ac = jnp.sqrt(jnp.asarray(alphas_cumprod, jnp.float32))
        self.sqrt_1mac = jnp.sqrt(1.0 - jnp.asarray(alphas_cumprod, jnp.float32))
        self.noise = None

    def set_targets(self, prompts, noise):
        self.noise = noise
        for gm in self.grad_modules:
            gm.set_targets(prompts)

    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        alpha = self.sqrt_ac[t].reshape(-1, 1, 1, 1)
        sigma = self.sqrt_1mac[t].reshape(-1, 1, 1, 1)

        def x_to_img(x):
            if self.speed == "hyper":
                return (x - sigma * self.noise) / alpha
            cosine_t = jnp.arctan2(sigma[:, 0, 0, 0], alpha[:, 0, 0, 0]) * 2 / jnp.pi
            pred = secondary_mod.forward(self.secondary_params, x, cosine_t)["pred"]
            # the reference's blend (guided.py:255-256), kept verbatim
            return pred * sigma + x * (1 - sigma)

        img, vjp = jax.vjp(x_to_img, x)
        img_grad = jnp.zeros_like(img)
        for gm in self.grad_modules:
            g = gm(img, t)
            g = jnp.where(jnp.isnan(g), 0.0, g)
            img_grad = img_grad + g
        (grad,) = vjp(img_grad)
        return -grad


class GuidedDiffusion(BaseDiffusionProcessor):
    """(`guided.py:277-339`)"""

    def __init__(
        self,
        grad_modules: Sequence = (),
        sampler: str = "ddim",
        timesteps: int = 100,
        ddim_eta: float = 0.0,
        speed: str = "fast",
        image_size: int = 256,
        unet_params=None,
        unet_cfg: unet_mod.UNetConfig = unet_mod.GUIDED_UNET,
        secondary_params=None,
        key=None,
    ):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        self.unet_cfg = unet_cfg
        self.unet_params = unet_params if unet_params is not None else unet_mod.init_params(k1, unet_cfg)
        if secondary_params is None:
            secondary_params = secondary_mod.init_params(k2)
        self.alphas_cumprod = make_ddpm_schedule(1000, schedule="linear")
        respacing = f"ddim{timesteps}" if sampler == "ddim" else str(timesteps)
        self.timestep_map = list(respaced_timesteps(1000, respacing))
        self.sampler = sampler
        self.ddim_eta = ddim_eta
        self.image_size = image_size
        self.conditioning = GradientGuidedConditioning(
            self.alphas_cumprod, secondary_params, [gm for gm in grad_modules if gm.scale != 0], speed=speed
        )
        self.original_num_steps = 1000

    def _eps_model(self, x, t):
        """UNet eps prediction at original timesteps (learn_sigma
        output keeps only the first 3 channels)."""
        out = unet_mod.forward(self.unet_params, x, t, self.unet_cfg)
        return out[..., : x.shape[-1]]

    def forward(self, img, prompts, t_start, t_end=1.0, verbose=True, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k_noise, k_sample = jax.random.split(key)
        img = jnp.asarray(img)
        n_map = len(self.timestep_map)
        # t_start is the skipped fraction (0 -> full generation from
        # max noise), matching stable.get_sigmas / latent / glide —
        # timestep_map is ascending, so index from the top
        start_step = round((1.0 - t_start) * (n_map - 1))
        end_step = round((1.0 - t_end) * (n_map - 1))
        if t_end <= t_start or start_step < end_step:
            return img

        noise = jax.random.normal(k_noise, img.shape)
        self.conditioning.set_targets(prompts, noise)

        t0 = self.timestep_map[start_step]
        x = q_sample(img, jnp.full((img.shape[0],), self.alphas_cumprod[t0], jnp.float32), noise)

        # descending original timesteps for the run; a full run
        # (t_start=0, t_end=1) covers index 0 so every requested
        # denoise step executes (reference runs the full schedule)
        steps = np.asarray(self.timestep_map[end_step : start_step + 1][::-1])

        guided = len(self.conditioning.grad_modules) > 0

        def eps_model(x, t):
            eps = self._eps_model(x, t)
            if guided:
                grad = self.conditioning(x, t)
                sqrt_1mac = jnp.sqrt(1 - jnp.asarray(self.alphas_cumprod, jnp.float32))[t].reshape(-1, 1, 1, 1)
                eps = eps - sqrt_1mac * grad
            return eps

        # image-space model: clamp pred_x0 each step like
        # guided-diffusion's clip_denoised=True default
        if self.sampler == "plms":
            _, pred = plms_sample_loop(eps_model, x, steps, self.alphas_cumprod, clip_denoised=True)
        else:
            eta = self.ddim_eta if self.sampler == "ddim" else 1.0
            _, pred = ddim_sample_loop(eps_model, x, steps, self.alphas_cumprod, eta=eta, key=k_sample,
                                       clip_denoised=True)
        return pred.astype(jnp.float32)
