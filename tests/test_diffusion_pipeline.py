"""Integration tests for the diffusion stack with tiny random models
(reference: maua/diffusion/processors/stable.py, guided.py, image.py;
test strategy mirrors tests/diffusion.py with shape asserts + sampler
matrix but runs offline on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.diffusion.models import unet as unet_mod
from maua_tpu.diffusion.models import vae as vae_mod
from maua_tpu.diffusion.processors.guided import GuidedDiffusion
from maua_tpu.diffusion.processors.stable import StableDiffusion
from maua_tpu.text.clip_text import CLIPTextConfig
from maua_tpu.prompt import ContentPrompt, StylePrompt, TextPrompt

TINY_UNET = unet_mod.UNetConfig(
    in_channels=4, out_channels=4, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(2,), num_heads=4, context_dim=64, transformer_depth=1,
)
TINY_VAE = vae_mod.VAEConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1, z_channels=4)
TINY_TEXT = CLIPTextConfig(width=64, layers=2, heads=4, context_length=16)
TINY_GUIDED = unet_mod.UNetConfig(
    in_channels=3, out_channels=6, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(2,), num_head_channels=8, context_dim=None,
    use_scale_shift_norm=True, resblock_updown=True,
)


@pytest.fixture(scope="module")
def sd():
    return StableDiffusion(
        sampler="euler", timesteps=5, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT,
        image_size=64,
    )


def test_unet_shapes():
    params = unet_mod.init_params(jax.random.PRNGKey(0), TINY_UNET)
    x = np.random.RandomState(0).randn(2, 16, 16, 4).astype(np.float32)
    ctx = np.random.RandomState(1).randn(2, 8, 64).astype(np.float32)
    out = unet_mod.forward(params, x, jnp.array([1.0, 500.0]), TINY_UNET, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.all(np.isfinite(np.asarray(out)))
    # context changes output (cross-attention live)
    out2 = unet_mod.forward(params, x, jnp.array([1.0, 500.0]), TINY_UNET, ctx + 1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_guided_unet_shapes():
    params = unet_mod.init_params(jax.random.PRNGKey(1), TINY_GUIDED)
    x = np.random.RandomState(0).randn(1, 16, 16, 3).astype(np.float32)
    out = unet_mod.forward(params, x, jnp.array([10.0]), TINY_GUIDED)
    assert out.shape == (1, 16, 16, 6)


def test_vae_roundtrip_shapes():
    params = vae_mod.init_params(jax.random.PRNGKey(2), TINY_VAE)
    img = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32).clip(-1, 1)
    z = vae_mod.encode(params, img, TINY_VAE)
    assert z.shape == (1, 16, 16, 4)
    rec = vae_mod.decode(params, z, TINY_VAE)
    assert rec.shape == (1, 32, 32, 3)


def test_stable_txt2img(sd):
    img = np.zeros((1, 32, 32, 3), np.float32)
    out = sd(img, [TextPrompt("a test prompt")], t_start=0.0)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_stable_img2img_partial(sd):
    img = np.random.RandomState(3).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    out = sd(img, [TextPrompt("x")], t_start=0.6)
    assert out.shape == img.shape
    # in latent space (model-independent of the random VAE), a partial
    # denoise must stay closer to the input than a full resample
    lat = np.random.RandomState(4).randn(1, 8, 8, 4).astype(np.float32)
    out_part = sd(lat, [TextPrompt("x")], t_start=0.6, latent=True)
    out_full = sd(lat, [TextPrompt("x")], t_start=0.0, latent=True, key=jax.random.PRNGKey(9))
    d_partial = float(np.abs(np.asarray(out_part) - lat).mean())
    d_full = float(np.abs(np.asarray(out_full) - lat).mean())
    assert d_partial < d_full


@pytest.mark.parametrize("sampler", ["euler", "heun", "lms", "dpmpp_2m", "euler_ancestral",
                                     "dpm_fast", "dpm_adaptive"])
def test_stable_sampler_matrix(sampler):
    sd = StableDiffusion(sampler=sampler, timesteps=4, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
                         text_cfg=TINY_TEXT, image_size=64)
    img = np.zeros((1, 32, 32, 3), np.float32)
    out = sd(img, [TextPrompt("t")], t_start=0.0)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cfg_scale_changes_output():
    base = dict(timesteps=4, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, image_size=64)
    sd1 = StableDiffusion(sampler="euler", cfg_scale=1.0, **base)
    sd2 = StableDiffusion(sampler="euler", cfg_scale=9.0, **base)
    img = np.zeros((1, 32, 32, 3), np.float32)
    a = np.asarray(sd1(img, [TextPrompt("t")], 0.0))
    b = np.asarray(sd2(img, [TextPrompt("t")], 0.0))
    assert not np.allclose(a, b)


@pytest.mark.parametrize("sampler", ["ddim", "plms"])
def test_guided_diffusion_samplers(sampler):
    gd = GuidedDiffusion(sampler=sampler, timesteps=5, unet_cfg=TINY_GUIDED, image_size=32)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    out = gd(img, [], t_start=0.0, t_end=1.0)
    assert out.shape == img.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_guided_diffusion_with_color_guidance():
    from maua_tpu.grad import ColorMatchGrads

    gd = GuidedDiffusion(grad_modules=[ColorMatchGrads(scale=100.0)], sampler="ddim", timesteps=4,
                         unet_cfg=TINY_GUIDED, image_size=32)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    style = np.ones((1, 16, 16, 3), np.float32) * 0.5
    out = gd(img, [StylePrompt(img=(style + 1) / 2)], t_start=0.2)
    assert out.shape == img.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_multires_pipeline():
    from maua_tpu.diffusion.image import image_sample

    sd = StableDiffusion(sampler="euler", timesteps=3, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
                         text_cfg=TINY_TEXT, image_size=64)
    out = image_sample(
        init="random", text="test", sizes=((64, 64), (128, 128)), skips=(0.0, 0.5),
        diffusion=sd, verbose=False,
    )
    assert out.shape == (1, 128, 128, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_multires_tiling():
    from maua_tpu.diffusion.image import MultiResolutionDiffusionProcessor

    sd = StableDiffusion(sampler="euler", timesteps=3, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
                         text_cfg=TINY_TEXT, image_size=64)
    out = MultiResolutionDiffusionProcessor()(
        diffusion=sd, init="random", text="t", schedule={(128, 128): 0.5},
        tile_size=64, max_batch=2, verbose=False,
    )
    assert out.shape == (1, 128, 128, 3)


def test_guided_t_start_convention():
    """t_start is the skipped fraction across ALL processors: higher
    t_start means less noise is added and the input is better
    preserved (regression: guided had the convention inverted)."""
    gd = GuidedDiffusion(sampler="ddim", timesteps=6, unet_cfg=TINY_GUIDED, image_size=32)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    near_clean = np.asarray(gd(img, [], t_start=0.9, key=jax.random.PRNGKey(1)))
    full_gen = np.asarray(gd(img, [], t_start=0.0, key=jax.random.PRNGKey(1)))
    d_clean = float(np.mean(np.abs(near_clean - img)))
    d_full = float(np.mean(np.abs(full_gen - img)))
    assert d_clean < d_full, (d_clean, d_full)


def test_latent_grad_guidance_changes_output():
    """GLID3XL-role latent grad conditioning is live: a color-match
    grad module must alter the sample (regression: guidance was a
    silent no-op)."""
    from maua_tpu.diffusion.processors.glide import GLID3XL
    from maua_tpu.grad import ColorMatchGrads

    base = dict(timesteps=3, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, image_size=64)
    plain = GLID3XL(sampler="ddim", **base, key=jax.random.PRNGKey(5))
    guided = GLID3XL(grad_modules=[ColorMatchGrads(scale=5000.0)], sampler="ddim", **base,
                     key=jax.random.PRNGKey(5))
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    style = np.ones((1, 16, 16, 3), np.float32) * 0.5
    prompts = [TextPrompt("x"), StylePrompt(img=(style + 1) / 2)]
    a = np.asarray(plain(img, prompts, 0.4, key=jax.random.PRNGKey(2)))
    b = np.asarray(guided(img, prompts, 0.4, key=jax.random.PRNGKey(2)))
    assert np.all(np.isfinite(b))
    assert not np.allclose(a, b)


def test_image_conditioned_stable():
    """Image-conditioned SD variant (the reference's "pinkney"
    checkpoint, `stable.py:114-127,144-147`): an ImagePrompt's CLIP
    image embedding is the cross-attention context, and different
    prompt images change the sample."""
    from maua_tpu.perceptors.clip import CLIPVisionConfig
    from maua_tpu.prompt import ImagePrompt

    vis = CLIPVisionConfig(image_size=32, patch_size=8, width=32, layers=2, heads=4, embed_dim=64)
    sd = StableDiffusion(
        sampler="euler", timesteps=3, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT,
        image_size=32, image_cond=True, vision_cfg=vis, key=jax.random.PRNGKey(7),
    )
    rs = np.random.RandomState(0)
    img = rs.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    p1 = ImagePrompt(img=rs.rand(1, 32, 32, 3).astype(np.float32))
    p2 = ImagePrompt(img=np.zeros((1, 32, 32, 3), np.float32))
    cond, uncond = sd.conditioning([p1])
    assert cond.shape == (1, 1, 64) and uncond.shape == (1, 1, 64)
    a = np.asarray(sd(img, [p1], 0.3, key=jax.random.PRNGKey(2)))
    b = np.asarray(sd(img, [p2], 0.3, key=jax.random.PRNGKey(2)))
    assert a.shape == (1, 32, 32, 3) and np.all(np.isfinite(a))
    assert not np.allclose(a, b)

    # the factory flips the variant on when an image prompt is given
    # (`maua/diffusion/image.py:111`)
    from maua_tpu.diffusion.image import get_diffusion_model

    m = get_diffusion_model("stable", timesteps=3, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
                            text_cfg=TINY_TEXT, vision_cfg=vis, image="x.png")
    assert m.image_cond
    m2 = get_diffusion_model("stable", timesteps=3, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
                             text_cfg=TINY_TEXT)
    assert not m2.image_cond
