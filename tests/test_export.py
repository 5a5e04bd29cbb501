"""StableHLO export artifacts: roundtrip, generator export, metadata."""

import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp

from maua_tpu.export import export_fn, export_generator, exported_meta, load_exported


def test_export_fn_roundtrip(tmp_path):
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 3))

    def fn(x):
        return jnp.tanh(x @ w)  # w baked in as a constant

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    path = export_fn(fn, (x,), str(tmp_path / "fn.stablehlo"))
    meta = exported_meta(path)
    assert any("2,4" in a.replace(" ", "") for a in meta["in_avals"])
    out = load_exported(path)(x)
    assert np.allclose(np.asarray(out), np.asarray(fn(x)), atol=1e-6)


def test_export_generator_matches_service_output(tmp_path):
    from maua_tpu.gan.stylegan2 import SG2Config
    from maua_tpu.gan.wrappers import StyleGAN2

    cfg = SG2Config(img_resolution=32, z_dim=16, w_dim=16, channel_base=1024,
                    channel_max=32, num_fp16_res=0)
    gen = StyleGAN2(cfg=cfg)
    path = export_generator(gen, str(tmp_path / "g.stablehlo"), batch_size=2, truncation=0.8)

    z = np.random.RandomState(0).randn(2, 16).astype(np.float32)
    exported = np.asarray(load_exported(path)(z))
    ws = gen.mapper(jnp.asarray(z), truncation=0.8)
    direct = np.asarray(jnp.clip((gen.synthesizer(ws) + 1.0) * 127.5, 0, 255).astype(jnp.uint8))
    assert exported.shape == (2, 32, 32, 3) and exported.dtype == np.uint8
    assert np.array_equal(exported, direct)


def test_artifact_gan_service_matches_live_service(tmp_path):
    from maua_tpu.gan.stylegan2 import SG2Config
    from maua_tpu.gan.wrappers import StyleGAN2
    from maua_tpu.serve import ArtifactGANService, GANImageService

    cfg = SG2Config(img_resolution=32, z_dim=16, w_dim=16, channel_base=1024,
                    channel_max=32, num_fp16_res=0)
    gen = StyleGAN2(cfg=cfg)
    path = export_generator(gen, str(tmp_path / "g.stablehlo"), batch_size=4)

    live = GANImageService(generator=gen, max_batch=4, max_wait_ms=10.0)
    art = ArtifactGANService(path, max_wait_ms=10.0)
    try:
        assert art.z_dim == 16 and art._batcher.max_batch == 4  # from the signature
        for payload in ({"seed": 3}, {"seed": 5, "truncation": 0.6}):
            a = art.submit(payload).result(timeout=300)
            b = live.submit(payload).result(timeout=300)
            assert np.array_equal(a, b), payload
    finally:
        live.close()
        art.close()


def test_export_diffusion_roundtrip(tmp_path):
    from maua_tpu.diffusion.models import unet as unet_mod
    from maua_tpu.diffusion.models import vae as vae_mod
    from maua_tpu.diffusion.processors.stable import StableDiffusion
    from maua_tpu.export import export_diffusion
    from maua_tpu.serve import text2img_fn
    from maua_tpu.text.clip_text import CLIPTextConfig, tokenize

    proc = StableDiffusion(
        sampler="euler", timesteps=2, image_size=16,
        unet_cfg=unet_mod.UNetConfig(in_channels=4, out_channels=4, model_channels=8,
                                     channel_mult=(1, 2), num_res_blocks=1,
                                     attention_resolutions=(2,), num_heads=2,
                                     context_dim=16, transformer_depth=1),
        vae_cfg=vae_mod.VAEConfig(base_channels=8, channel_mult=(1, 2), num_res_blocks=1, z_channels=4),
        text_cfg=CLIPTextConfig(width=16, layers=1, heads=2, context_length=8),
    )
    path = export_diffusion(proc, str(tmp_path / "sd.stablehlo"), batch_size=2)
    tokens = np.asarray(tokenize(["a red boat", "a blue cube"], 8), np.int32)
    seeds = np.asarray([1, 2], np.uint32)
    scales = np.asarray([7.5, 2.0], np.float32)
    exported = np.asarray(load_exported(path)(tokens, seeds, scales))
    direct = np.asarray(text2img_fn(proc)(tokens, seeds, scales))
    assert exported.shape == (2, 16, 16, 3) and exported.dtype == np.uint8
    assert np.array_equal(exported, direct)


def test_exported_artifact_loads_without_model_code(tmp_path):
    """The deployment contract: a fresh process that never imports the
    model definitions replays the artifact."""
    from maua_tpu.gan.stylegan2 import SG2Config
    from maua_tpu.gan.wrappers import StyleGAN2

    cfg = SG2Config(img_resolution=16, z_dim=8, w_dim=8, channel_base=512,
                    channel_max=16, num_fp16_res=0)
    path = export_generator(StyleGAN2(cfg=cfg), str(tmp_path / "g.stablehlo"), batch_size=1)

    script = f"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, zipfile
with zipfile.ZipFile({path!r}) as zf:
    exported = jax.export.deserialize(bytearray(zf.read("module.stablehlo")))
out = exported.call(np.zeros((1, 8), np.float32), np.ones((1,), np.float32))
assert out.shape == (1, 16, 16, 3) and str(out.dtype) == "uint8"
print("ARTIFACT_OK")
"""
    r = subprocess.run([sys.executable, "-c", script], capture_output=True, text=True, timeout=300)
    assert "ARTIFACT_OK" in r.stdout, r.stderr[-800:]
