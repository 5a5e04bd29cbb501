"""LatentDiffusion processor: CompVis LDM txt2img with alpha-space
DDIM/PLMS samplers.

Rebuild of `maua/diffusion/processors/latent.py` (LatentDiffusion
:104-127): cond/uncond CFG, plms/ddim, encode -> q_sample -> sample ->
decode. Shares models with the StableDiffusion processor; the sampler
runs in discrete-timestep alpha space instead of Karras sigma space.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from ...text.clip_text import CLIPTextConfig, encode_text, tokenize
from ...text.clip_text import init_params as init_text_params
from ...prompt import TextPrompt
from ..models import unet as unet_mod
from ..models import vae as vae_mod
from ..samplers import ddim_sample_loop, make_ddpm_schedule, plms_sample_loop, q_sample
from .base import BaseDiffusionProcessor


class LatentDiffusion(BaseDiffusionProcessor):
    def __init__(
        self,
        cfg_scale: float = 5.0,
        sampler: str = "plms",
        timesteps: int = 50,
        ddim_eta: float = 0.0,
        image_size: int = 256,
        grad_modules=(),
        unet_params=None,
        unet_cfg: unet_mod.UNetConfig = unet_mod.SD1_UNET,
        vae_params=None,
        vae_cfg: vae_mod.VAEConfig = vae_mod.VAEConfig(),
        text_params=None,
        text_cfg: CLIPTextConfig = CLIPTextConfig(),
        key=None,
    ):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        self.unet_cfg = unet_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg
        self.unet_params = unet_params if unet_params is not None else unet_mod.init_params(k1, unet_cfg)
        self.vae_params = vae_params if vae_params is not None else vae_mod.init_params(k2, vae_cfg)
        self.text_params = text_params if text_params is not None else init_text_params(k3, text_cfg)
        self.alphas_cumprod = make_ddpm_schedule(1000, schedule="scaled_linear")
        self.sampler = sampler
        self.timesteps = timesteps
        self.ddim_eta = ddim_eta
        self.cfg_scale = cfg_scale
        self.image_size = image_size
        self.grad_modules = [gm for gm in grad_modules if getattr(gm, "scale", 1) != 0]
        self.timestep_map = np.linspace(0, 999, timesteps).round().astype(int)

    def conditioning(self, prompts):
        texts = [p.text for p in prompts if isinstance(p, TextPrompt)]
        cl = self.text_cfg.context_length
        cond = encode_text(self.text_params, jnp.asarray(tokenize(" ".join(texts) or "", cl)), self.text_cfg)
        uncond = encode_text(self.text_params, jnp.asarray(tokenize("", cl)), self.text_cfg)
        return cond, uncond

    def encode(self, img):
        return vae_mod.encode(self.vae_params, jnp.asarray(img), self.vae_cfg)

    def decode(self, x):
        return vae_mod.decode(self.vae_params, x, self.vae_cfg)

    def forward(self, img, prompts, t_start, t_end=1.0, verbose=True, latent=False, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k_noise, k_sample = jax.random.split(key)
        img = jnp.asarray(img)
        cond, uncond = self.conditioning(prompts)

        n = len(self.timestep_map)
        start = round((1 - t_start) * (n - 1)) if t_start > 0 else n - 1
        steps = self.timestep_map[: start + 1][::-1].copy()  # descending
        if len(steps) == 0:
            return img

        ds = self.vae_cfg.downscale
        if t_start > 0:
            x0 = img if latent else self.encode(img)
            noise = jax.random.normal(k_noise, x0.shape)
            x = q_sample(x0, jnp.full((x0.shape[0],), self.alphas_cumprod[steps[0]], jnp.float32), noise)
        else:
            b, h, w = img.shape[0], img.shape[1], img.shape[2]
            if not latent:
                h, w = h // ds, w // ds
            x = jax.random.normal(k_noise, (b, h, w, self.vae_cfg.z_channels))

        b = x.shape[0]

        def eps_model(x_t, t):
            x_in = jnp.concatenate([x_t, x_t])
            t_in = jnp.concatenate([t, t]).astype(jnp.float32)
            ctx = jnp.concatenate([
                jnp.broadcast_to(uncond, (b,) + uncond.shape[1:]),
                jnp.broadcast_to(cond, (b,) + cond.shape[1:]),
            ])
            eps = unet_mod.forward(self.unet_params, x_in, t_in, self.unet_cfg, ctx)
            un, co = eps[:b], eps[b:]
            return un + (co - un) * self.cfg_scale

        if self.grad_modules:
            # latent grad conditioning (`glid3xl.py:105-150` role):
            # decode the eps-implied x0 prediction, take the guidance
            # gradient in image space, pull it back through the VAE
            # decoder to the latent and fold it into eps
            for gm in self.grad_modules:
                gm.set_targets(prompts)
            base_eps_model = eps_model
            acp = jnp.asarray(self.alphas_cumprod, jnp.float32)

            def eps_model(x_t, t):  # noqa: F811
                eps = base_eps_model(x_t, t)
                a_t = acp[t.astype(jnp.int32)].reshape((-1,) + (1,) * (x_t.ndim - 1))
                pred_x0 = (x_t - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
                imgd, vjp_dec = jax.vjp(self.decode, pred_x0)
                img_grad = jnp.zeros_like(imgd)
                for gm in self.grad_modules:
                    img_grad = img_grad + gm(imgd, t)
                (x0_grad,) = vjp_dec(img_grad)
                # descend the guidance loss in pred-x0 space
                return eps + jnp.sqrt(1.0 - a_t) / jnp.sqrt(a_t) * jax.lax.stop_gradient(x0_grad)

        if self.sampler == "plms":
            _, pred = plms_sample_loop(eps_model, x, steps, self.alphas_cumprod)
            out = pred
        else:
            out_x, pred = ddim_sample_loop(eps_model, x, steps, self.alphas_cumprod, eta=self.ddim_eta,
                                           key=k_sample)
            out = out_x
        return out if latent else self.decode(out)
