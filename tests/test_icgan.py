"""Tests for IC-GAN (reference: maua/GAN/icgan/)."""

import numpy as np
import pytest

import jax

from maua_tpu.gan import icgan
from maua_tpu.gan import stylegan2 as sg2
from maua_tpu.perceptors.clip import CLIPPerceptor, CLIPVisionConfig
from maua_tpu.text.clip_text import CLIPTextConfig

CFG = sg2.SG2Config(img_resolution=32, z_dim=32, w_dim=32, c_dim=16, channel_base=1024,
                    channel_max=64, num_fp16_res=0)


def test_conditional_generation():
    gen = icgan.load_icgan(cfg=CFG)
    feats = icgan.instance_features(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1,
                                    dim=16)
    assert feats.shape == (2, 16)
    imgs = icgan.generate(gen, feats, n_per_instance=2)
    assert imgs.shape == (4, 32, 32, 3)
    # conditioning changes output
    imgs2 = icgan.generate(gen, feats + 1.0, n_per_instance=2)
    assert not np.allclose(np.asarray(imgs), np.asarray(imgs2))


def test_icgan_clip_optimization():
    gen = icgan.load_icgan(cfg=CFG)
    perceptor = CLIPPerceptor(
        vision_cfg=CLIPVisionConfig(image_size=32, patch_size=8, width=32, layers=1, heads=2, embed_dim=16),
        text_cfg=CLIPTextConfig(width=32, layers=1, heads=2, context_length=8),
    )
    imgs, latents = icgan.icgan_clip(gen, "test prompt", perceptor=perceptor, n_steps=3, batch=2,
                                     verbose=False)
    assert imgs.shape == (2, 32, 32, 3)
    assert "z" in latents and "c" in latents
    assert np.all(np.isfinite(np.asarray(imgs)))
