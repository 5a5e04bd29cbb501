"""Tests for the LatentDiffusion / GLIDE / GLID3XL processors
(reference: maua/diffusion/processors/{latent,glide,glid3xl}.py)."""

import numpy as np
import pytest

import jax

from maua_tpu.diffusion.models import unet as unet_mod
from maua_tpu.diffusion.models import vae as vae_mod
from maua_tpu.diffusion.processors.glide import GLIDE, GLID3XL
from maua_tpu.diffusion.processors.latent import LatentDiffusion
from maua_tpu.prompt import TextPrompt
from maua_tpu.text.clip_text import CLIPTextConfig

TINY_UNET = unet_mod.UNetConfig(
    in_channels=4, out_channels=4, model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(2,), num_heads=2, context_dim=32,
)
TINY_VAE = vae_mod.VAEConfig(base_channels=8, channel_mult=(1, 2), num_res_blocks=1)
TINY_TEXT = CLIPTextConfig(width=32, layers=1, heads=2, context_length=8)


@pytest.mark.parametrize("sampler", ["ddim", "plms"])
def test_latent_diffusion(sampler):
    ld = LatentDiffusion(sampler=sampler, timesteps=4, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
                         text_cfg=TINY_TEXT, image_size=32)
    img = np.zeros((1, 32, 32, 3), np.float32)
    out = ld(img, [TextPrompt("test")], t_start=0.0)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # img2img partial
    out2 = ld(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1,
              [TextPrompt("x")], t_start=0.5)
    assert out2.shape == (1, 32, 32, 3)


def test_glide_chain():
    base = unet_mod.UNetConfig(in_channels=3, out_channels=6, model_channels=16, channel_mult=(1, 2),
                               num_res_blocks=1, attention_resolutions=(2,), num_heads=2, context_dim=32,
                               use_scale_shift_norm=True)
    up = unet_mod.UNetConfig(in_channels=6, out_channels=6, model_channels=16, channel_mult=(1, 2),
                             num_res_blocks=1, attention_resolutions=(2,), num_heads=2, context_dim=32,
                             use_scale_shift_norm=True)
    g = GLIDE(timesteps=3, base_cfg=base, up_cfg=up, base_size=16, image_size=32,
              text_cfg=TINY_TEXT)
    img = np.zeros((1, 32, 32, 3), np.float32)
    out = g(img, [TextPrompt("test")], t_start=0.0)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_glid3xl():
    g = GLID3XL(sampler="plms", timesteps=3, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
                text_cfg=TINY_TEXT, image_size=32)
    img = np.zeros((1, 32, 32, 3), np.float32)
    out = g(img, [TextPrompt("test")], t_start=0.0)
    assert out.shape == (1, 32, 32, 3)
