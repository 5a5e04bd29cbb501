"""Tests for the diffusion loop pipeline + super comparison
(reference: maua/diffusion/experimental/loop.py,
maua/super/image/comparison.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.diffusion.loop import loop_video, looped_noise
from maua_tpu.diffusion.models import unet as unet_mod
from maua_tpu.diffusion.models import vae as vae_mod
from maua_tpu.diffusion.processors.stable import StableDiffusion
from maua_tpu.text.clip_text import CLIPTextConfig


def test_looped_noise_wraps():
    n = looped_noise(jax.random.PRNGKey(0), 24, (8, 8, 2), sigma=5.0)
    n = np.asarray(n)
    # circular smoothing: first/last frames far more similar than
    # first/middle
    d_wrap = np.abs(n[0] - n[-1]).mean()
    d_mid = np.abs(n[0] - n[12]).mean()
    assert d_wrap < d_mid * 0.7


def test_loop_video():
    sd = StableDiffusion(
        sampler="euler", timesteps=3,
        unet_cfg=unet_mod.UNetConfig(in_channels=4, out_channels=4, model_channels=16,
                                     channel_mult=(1, 2), num_res_blocks=1,
                                     attention_resolutions=(), context_dim=32),
        vae_cfg=vae_mod.VAEConfig(base_channels=8, channel_mult=(1, 2), num_res_blocks=1),
        text_cfg=CLIPTextConfig(width=32, layers=1, heads=2, context_length=8),
        image_size=32,
    )
    init = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    video = loop_video(sd, init, n_frames=6, t_start=0.5, text="x", batch_size=3, verbose=False)
    assert video.shape == (6, 32, 32, 3)
    assert np.all(np.isfinite(video))
    # frames vary but loop endpoints stay close
    assert np.abs(video[0] - video[3]).mean() > 0


def test_super_comparison(tmp_path, monkeypatch):
    from maua_tpu.super import image as sup
    from maua_tpu.super.models import rrdbnet

    monkeypatch.setitem(sup.MODEL_REGISTRY, "tinyA",
                        ("rrdb", rrdbnet.RRDBConfig(num_feat=8, num_block=1, num_grow_ch=4)))
    monkeypatch.setitem(sup.MODEL_REGISTRY, "tinyB",
                        ("srvgg", rrdbnet.SRVGGConfig(num_feat=8, num_conv=2)))
    img = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
    results = sup.compare(img, model_names=["tinyA", "tinyB"], out_dir=str(tmp_path))
    assert set(results) == {"tinyA", "tinyB"}
    assert results["tinyA"].shape == (1, 32, 32, 3)
