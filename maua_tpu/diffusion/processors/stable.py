"""Stable-Diffusion-class latent diffusion processor.

Rebuild of `maua/diffusion/processors/stable.py` (StableDiffusion
:151-271): CLIP text conditioning + CFG (:274-279), k-diffusion
sigma-space samplers (:185-207), partial-range sigma scheduling
(:232-238), gradient guidance through the decoder (:212-220, 282-291).
The sliced-attention memory patch (:33-86) is unnecessary here — the
UNet's attention runs through the Pallas flash kernel.

The whole sampling loop is one jitted lax.scan; encode/sample/decode
stay on device.
"""

from __future__ import annotations


from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...prompt import ImagePrompt, TextPrompt
from ...text.clip_text import CLIPTextConfig, encode_text, tokenize
from ...text.clip_text import init_params as init_text_params
from ..models import unet as unet_mod
from ..models import vae as vae_mod
from ..samplers import get_sampler, make_ddpm_schedule
from ..wrappers import EpsDenoiser, cfg_denoiser, guided_denoiser
from .base import BaseDiffusionProcessor


class StableDiffusion(BaseDiffusionProcessor):
    """forward(img, prompts, t_start, t_end) partial-denoise processor
    (`stable.py:240-271`)."""

    def __init__(
        self,
        grad_modules: Sequence = (),
        sampler: str = "lms",
        timesteps: int = 50,
        cfg_scale: float = 7.5,
        image_size: int = 512,
        unet_params=None,
        unet_cfg: unet_mod.UNetConfig = unet_mod.SD1_UNET,
        vae_params=None,
        vae_cfg: vae_mod.VAEConfig = vae_mod.VAEConfig(),
        text_params=None,
        text_cfg: CLIPTextConfig = CLIPTextConfig(),
        image_cond: bool = False,
        vision_params=None,
        vision_cfg=None,
        key=None,
    ):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.unet_cfg = unet_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg
        self.unet_params = unet_params if unet_params is not None else unet_mod.init_params(k1, unet_cfg)
        self.vae_params = vae_params if vae_params is not None else vae_mod.init_params(k2, vae_cfg)
        self.text_params = text_params if text_params is not None else init_text_params(k3, text_cfg)
        # image-conditioned variant (`stable.py:114-127` "pinkney"):
        # cross-attention context is the CLIP image embedding of an
        # ImagePrompt instead of text token embeddings
        self.image_cond = image_cond
        if image_cond:
            from ...perceptors import clip as clip_vision

            self.vision_cfg = vision_cfg or clip_vision.CLIPVisionConfig(embed_dim=unet_cfg.context_dim)
            self.vision_params = (
                vision_params if vision_params is not None
                else clip_vision.init_vision_params(k4, self.vision_cfg)
            )

        self.alphas_cumprod = make_ddpm_schedule(1000, schedule="scaled_linear")
        self.denoiser = EpsDenoiser(
            lambda x, t, context=None: unet_mod.forward(self.unet_params, x, t, unet_cfg, context),
            self.alphas_cumprod,
        )
        self.sigmas = self.denoiser.get_sigmas(timesteps)
        self.sample_fn = get_sampler(sampler)
        self.sampler_name = sampler
        self.cfg_scale = cfg_scale
        self.image_size = image_size
        self.grad_modules = [gm for gm in grad_modules if getattr(gm, "scale", 1) != 0]

        # One jitted program per (shape, sigma-count) for the UNGUIDED
        # path: eagerly-dispatched sampling pays the per-op round trip
        # on remote backends (~26 ms on the axon relay — measured 50 s
        # for a 50-step 256^2 sample that the jitted path runs in ~2 s).
        # The guided path stays eager: grad-module targets mutate
        # between calls and would bake into a trace as constants.
        # sigmas ride as a STATIC tuple: several samplers derive host
        # constants from the sigma values (lms quadrature coefficients,
        # ancestral step sizes), so they must be concrete at trace time;
        # one retrace per distinct schedule (one per (t_start, steps)).
        # Params are ARGUMENTS, never closure captures: closed-over
        # weights serialize into the HLO as constants — a multi-GB
        # compile payload the relay's remote_compile rejects.
        def _sample_unguided(unet_params, x, sigmas_t, cond, uncond, key):
            sigmas = np.asarray(sigmas_t, np.float32)
            den = EpsDenoiser(
                lambda xx, t, context=None: unet_mod.forward(unet_params, xx, t, unet_cfg, context),
                self.alphas_cumprod,
            )
            model_fn = cfg_denoiser(den, cond, uncond, self.cfg_scale)
            if self.sampler_name in ("euler_ancestral", "dpm_2_ancestral"):
                return self.sample_fn(model_fn, x, sigmas, key=key)
            return self.sample_fn(model_fn, x, sigmas)

        self._jit_sample = jax.jit(_sample_unguided, static_argnums=(2,))
        self._jit_encode = jax.jit(lambda p, img: vae_mod.encode(p, img, self.vae_cfg))
        self._jit_decode = jax.jit(lambda p, z: vae_mod.decode(p, z, self.vae_cfg))

    # ------------------------------------------------------ conditioning
    def conditioning(self, prompts):
        """Prompts -> (cond, uncond) embeddings (`stable.py:133-148`).

        With image_cond=True an ImagePrompt conditions through the CLIP
        image tower — one context token of the image embedding, with
        the embedding of uniform noise as the unconditional branch
        (`stable.py:144-147`)."""
        if self.image_cond:
            imgs = [p for p in prompts if isinstance(p, ImagePrompt)]
            if imgs:
                from ...perceptors.clip import encode_image

                img = jnp.asarray(imgs[-1].img)
                s = self.vision_cfg.image_size
                if img.shape[1:3] != (s, s):
                    img = jax.image.resize(img, (img.shape[0], s, s, img.shape[3]), "bilinear")
                cond = encode_image(self.vision_params, img, self.vision_cfg)[:, None, :]
                noise = jax.random.uniform(jax.random.PRNGKey(0), img.shape) * 2.0 - 1.0
                uncond = encode_image(self.vision_params, noise, self.vision_cfg)[:, None, :]
                return cond, uncond
        texts = [p.text for p in prompts if isinstance(p, TextPrompt)]
        text = " ".join(texts) if texts else ""
        cl = self.text_cfg.context_length
        cond = encode_text(self.text_params, jnp.asarray(tokenize(text, cl)), self.text_cfg)
        uncond = encode_text(self.text_params, jnp.asarray(tokenize("", cl)), self.text_cfg)
        return cond, uncond

    def encode(self, img):
        return vae_mod.encode(self.vae_params, jnp.asarray(img), self.vae_cfg)

    def decode(self, x):
        return vae_mod.decode(self.vae_params, x, self.vae_cfg)

    def get_sigmas(self, t_s: float, t_e: Optional[float] = None):
        """Partial sigma range (`stable.py:232-238`): t indexes the
        descending sigma schedule (t=0 -> full noise)."""
        step_start = round(t_s * (len(self.sigmas) - 1))
        if t_e is None:
            return self.sigmas[step_start]
        step_end = round(t_e * (len(self.sigmas) - 1)) + 1
        return self.sigmas[step_start:step_end]

    # ----------------------------------------------------------- forward
    def forward(self, img, prompts, t_start, t_end=1.0, verbose=True, reverse=False, latent=False, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k_noise, k_sample = jax.random.split(key)
        img = jnp.asarray(img)

        sigmas = np.asarray(self.get_sigmas(t_start, t_end))
        if reverse:
            sigmas = sigmas[::-1].copy()
        if len(sigmas) < 2:
            return img

        cond, uncond = self.conditioning(prompts)
        guided = bool(self.grad_modules)
        model_fn = cfg_denoiser(self.denoiser, cond, uncond, self.cfg_scale)

        if guided:
            for gm in self.grad_modules:
                gm.set_targets(prompts)

            def cond_fn(x, sigma, denoised, vjp):
                imgd, vjp_dec = jax.vjp(lambda z: vae_mod.decode(self.vae_params, z, self.vae_cfg), denoised)
                img_grad = jnp.zeros_like(imgd)
                for gm in self.grad_modules:
                    img_grad = img_grad + gm(imgd, sigma)
                (z_grad,) = vjp_dec(img_grad)
                (x_grad,) = vjp(z_grad)
                return -x_grad

            model_fn = guided_denoiser(model_fn, cond_fn)

        ds = self.vae_cfg.downscale
        if t_start > 0 or reverse:
            x = img if latent else (self.encode(img) if guided else self._jit_encode(self.vae_params, jnp.asarray(img)))
            x = x + jax.random.normal(k_noise, x.shape) * sigmas[0]
        else:
            b = img.shape[0]
            h, w = img.shape[1], img.shape[2]
            if not latent:
                h, w = h // ds, w // ds
            x = jax.random.normal(k_noise, (b, h, w, self.vae_cfg.z_channels)) * sigmas[0]

        if guided:
            if self.sampler_name in ("euler_ancestral", "dpm_2_ancestral"):
                out = self.sample_fn(model_fn, x, sigmas, key=k_sample)
            else:
                out = self.sample_fn(model_fn, x, sigmas)
        else:
            out = self._jit_sample(self.unet_params, x, tuple(float(s) for s in sigmas), cond, uncond, k_sample)
        out = out if latent else (self.decode(out) if guided else self._jit_decode(self.vae_params, out))
        return out.astype(jnp.float32)
