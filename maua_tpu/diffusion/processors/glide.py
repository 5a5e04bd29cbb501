"""GLIDE processor: 64px CFG base + 256px upsampler chain.

Rebuild of `maua/diffusion/processors/glide.py` (GLIDE.forward
:99-164): text-conditioned base diffusion at 64^2 with classifier-free
guidance, then a low-res-conditioned upsampler UNet to 256^2.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...prompt import TextPrompt
from ...text.clip_text import CLIPTextConfig, encode_text, tokenize
from ...text.clip_text import init_params as init_text_params
from ..models import unet as unet_mod
from ..samplers import ddim_sample_loop, make_ddpm_schedule, q_sample
from .base import BaseDiffusionProcessor

GLIDE_BASE = unet_mod.UNetConfig(
    in_channels=3, out_channels=6, model_channels=192, channel_mult=(1, 2, 3, 4), num_res_blocks=3,
    attention_resolutions=(2, 4, 8), num_head_channels=64, context_dim=512, use_scale_shift_norm=True,
)
GLIDE_UPSAMPLE = unet_mod.UNetConfig(
    in_channels=6, out_channels=6, model_channels=192, channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=2,
    attention_resolutions=(8, 16, 32), num_head_channels=64, context_dim=512, use_scale_shift_norm=True,
)


class GLIDE(BaseDiffusionProcessor):
    def __init__(
        self,
        cfg_scale: float = 3.0,
        sampler: str = "ddim",
        timesteps: int = 50,
        image_size: int = 256,
        base_cfg: unet_mod.UNetConfig = GLIDE_BASE,
        up_cfg: unet_mod.UNetConfig = GLIDE_UPSAMPLE,
        base_params=None,
        up_params=None,
        text_params=None,
        text_cfg: Optional[CLIPTextConfig] = None,
        base_size: int = 64,
        key=None,
    ):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        self.base_cfg = base_cfg
        self.up_cfg = up_cfg
        self.text_cfg = text_cfg or CLIPTextConfig(width=512, layers=4, heads=8)
        self.base_params = base_params if base_params is not None else unet_mod.init_params(k1, base_cfg)
        self.up_params = up_params if up_params is not None else unet_mod.init_params(k2, up_cfg)
        self.text_params = text_params if text_params is not None else init_text_params(k3, self.text_cfg)
        self.alphas_cumprod = make_ddpm_schedule(1000, schedule="cosine")
        self.cfg_scale = cfg_scale
        self.timesteps = timesteps
        self.image_size = image_size
        self.base_size = base_size
        self.timestep_map = np.linspace(0, 999, timesteps).round().astype(int)

    def conditioning(self, prompts):
        texts = [p.text for p in prompts if isinstance(p, TextPrompt)]
        cl = self.text_cfg.context_length
        cond = encode_text(self.text_params, jnp.asarray(tokenize(" ".join(texts) or "", cl)), self.text_cfg)
        uncond = encode_text(self.text_params, jnp.asarray(tokenize("", cl)), self.text_cfg)
        return cond, uncond

    def _sample(self, unet_params, unet_cfg, x, steps, context_pair, extra=None, key=None, guided=True):
        cond, uncond = context_pair
        b = x.shape[0]

        def eps_model(x_t, t):
            xc = x_t if extra is None else jnp.concatenate([x_t, extra], axis=-1)
            if guided:
                x_in = jnp.concatenate([xc, xc])
                t_in = jnp.concatenate([t, t]).astype(jnp.float32)
                ctx = jnp.concatenate([
                    jnp.broadcast_to(uncond, (b,) + uncond.shape[1:]),
                    jnp.broadcast_to(cond, (b,) + cond.shape[1:]),
                ])
                out = unet_mod.forward(unet_params, x_in, t_in, unet_cfg, ctx)[..., : x_t.shape[-1]]
                un, co = out[:b], out[b:]
                return un + (co - un) * self.cfg_scale
            ctx = jnp.broadcast_to(cond, (b,) + cond.shape[1:])
            return unet_mod.forward(unet_params, xc, t.astype(jnp.float32), unet_cfg, ctx)[..., : x_t.shape[-1]]

        # image-space model -> clip_denoised like the reference
        _, pred = ddim_sample_loop(eps_model, x, steps, self.alphas_cumprod, eta=0.0, key=key,
                                   clip_denoised=True)
        return pred

    def forward(self, img, prompts, t_start, t_end=1.0, verbose=True, key=None):
        """Base 64px CFG sample, then upsampler conditioned on the
        low-res output (`glide.py:99-164`)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        img = jnp.asarray(img)
        b = img.shape[0]
        ctx = self.conditioning(prompts)
        n = len(self.timestep_map)
        start = round(t_start * (n - 1))
        steps = self.timestep_map[: n - start][::-1].copy()

        # base stage at 64^2
        low = jax.image.resize(img, (b, self.base_size, self.base_size, 3), "bilinear")
        if t_start > 0:
            noise = jax.random.normal(k1, low.shape)
            x = q_sample(low, jnp.full((b,), self.alphas_cumprod[steps[0]], jnp.float32), noise)
        else:
            x = jax.random.normal(k1, low.shape)
        base_out = self._sample(self.base_params, self.base_cfg, x, steps, ctx, key=k2, guided=True)

        # upsampler stage to image_size, conditioned on the base output;
        # for partial-denoise calls start from the noised upsampled
        # output so the state matches the marginal at steps[0] (pure
        # N(0,1) only when running the full schedule)
        up_low = jax.image.resize(base_out, (b, self.image_size, self.image_size, 3), "bicubic")
        if t_start > 0:
            x_up = q_sample(up_low, jnp.full((b,), self.alphas_cumprod[steps[0]], jnp.float32),
                            jax.random.normal(k3, up_low.shape))
        else:
            x_up = jax.random.normal(k3, up_low.shape)
        up_out = self._sample(self.up_params, self.up_cfg, x_up, steps, ctx, extra=up_low, key=k4,
                              guided=False)
        return up_out.astype(jnp.float32)


class GLID3XL(BaseDiffusionProcessor):
    """LDM-space guided diffusion with a BERT text encoder
    (`maua/diffusion/processors/glid3xl.py:152-270`): structurally the
    LatentDiffusion processor with guided-diffusion-style latent grad
    conditioning (:105-150), but conditioned through the
    latent-diffusion BERTEmbedder (`text/bert.py`) exactly like the
    reference's `bert.encode` context (:243-246) — real glid-3-xl
    bert.pt checkpoints convert via `text.bert.params_from_torch`."""

    def __init__(self, grad_modules: Sequence = (), cfg_scale: float = 5.0, sampler: str = "plms",
                 timesteps: int = 50, image_size: int = 256, key=None,
                 bert=None, bert_checkpoint=None, bert_vocab=None, bert_cfg=None, **kw):
        from ...text.bert import BERTConfig, BERTEmbedder
        from .latent import LatentDiffusion

        self._ld = LatentDiffusion(cfg_scale=cfg_scale, sampler=sampler, timesteps=timesteps,
                                   image_size=image_size, key=key, grad_modules=grad_modules, **kw)
        if bert is None:
            cfg = bert_cfg or BERTConfig(
                width=self._ld.unet_cfg.context_dim, layers=2, heads=4,
                max_len=self._ld.text_cfg.context_length,
            )
            bert = BERTEmbedder(cfg, checkpoint=bert_checkpoint, vocab_path=bert_vocab, key=key)
        self.bert = bert
        # swap the CLIP-tower conditioning for BERT context embeddings
        # (instance attribute shadows the LatentDiffusion method)
        self._ld.conditioning = self._bert_conditioning
        self.grad_modules = self._ld.grad_modules
        self.image_size = image_size

    def _bert_conditioning(self, prompts):
        from ...prompt import TextPrompt

        texts = [p.text for p in prompts if isinstance(p, TextPrompt)]
        cond = self.bert([" ".join(texts) or ""])
        uncond = self.bert([""])  # negative prompt slot (`glid3xl.py:242`)
        return cond, uncond

    def forward(self, img, prompts, t_start, t_end=1.0, verbose=True, key=None):
        # latent grad conditioning lives inside LatentDiffusion's
        # guided eps model (set_targets is called there per forward)
        return self._ld.forward(img, prompts, t_start, t_end, verbose=verbose, key=key)
