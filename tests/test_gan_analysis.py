"""Tests for GAN metrics, sampling, blending, SeFa, NCA, CLI
(reference: maua/GAN/metrics, sampling, blending.py, decomposition,
maua/nca/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.gan import analysis, metrics, sampling
from maua_tpu.gan import stylegan2 as sg2

CFG = sg2.SG2Config(img_resolution=16, z_dim=32, w_dim=32, channel_base=512, channel_max=32, num_fp16_res=0)


def test_sqrtm_newton_schulz():
    rs = np.random.RandomState(0)
    A = rs.randn(8, 8).astype(np.float32)
    S = A @ A.T + np.eye(8)
    R = np.asarray(metrics.sqrtm_newton_schulz(jnp.asarray(S)))
    assert np.abs(R @ R - S).max() < 1e-2


def test_fid_zero_for_same_distribution():
    rs = np.random.RandomState(1)
    f = rs.randn(500, 16).astype(np.float32)
    assert abs(float(metrics.fid(f, f.copy()))) < 1e-2
    g = f + 5.0
    assert float(metrics.fid(f, g)) > 10.0


def test_kid_behavior():
    rs = np.random.RandomState(2)
    f = rs.randn(100, 8).astype(np.float32)
    same = float(metrics.kernel_distance(f[:50], f[50:]))
    diff = float(metrics.kernel_distance(f[:50], f[50:] + 3.0))
    assert diff > same


def test_prdc_identical_high():
    rs = np.random.RandomState(3)
    f = rs.randn(64, 8).astype(np.float32)
    out = metrics.prdc(f, f + 0.01 * rs.randn(64, 8).astype(np.float32))
    assert float(out["precision"]) > 0.9
    assert float(out["recall"]) > 0.9
    assert float(out["coverage"]) > 0.9


def test_compute_metrics_end_to_end():
    rs = np.random.RandomState(4)
    real = rs.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1
    fake = rs.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1
    out = metrics.compute_metrics(real, fake, batch=4)
    for k in ("fid", "kid", "precision", "recall", "density", "coverage"):
        assert k in out and np.isfinite(out[k])


@pytest.fixture(scope="module")
def tiny_params():
    return sg2.init_params(jax.random.PRNGKey(0), CFG)


def test_sampling_strategies(tiny_params):
    key = jax.random.PRNGKey(1)
    z = sampling.sample_latents("random", key, 4, z_dim=CFG.z_dim)
    assert z.shape == (4, 32)
    zp = sampling.sample_latents("polarity", key, 4, tiny_params, CFG, n_probe=32)
    assert zp.shape == (4, 32)
    zj = sampling.sample_latents("jacnorm", key, 3, tiny_params, CFG, oversample=2)
    assert zj.shape == (3, 32)
    energy = lambda z: jnp.sum(jnp.square(z - 2.0), axis=-1)
    zl = sampling.sample_latents("langevin", key, 4, energy_fn=energy, z_dim=8, n_steps=200, step_size=0.05)
    assert zl.shape == (4, 8)
    # langevin should drift toward the energy minimum at 2
    assert abs(float(zl.mean()) - 2.0) < 1.0


def test_blending_and_sefa(tiny_params):
    p2 = sg2.init_params(jax.random.PRNGKey(9), CFG)
    blended = analysis.blend_models(tiny_params, p2, CFG, midpoint_resolution=8)
    # low-res from model A, high-res from model B
    assert np.allclose(
        np.asarray(blended["synthesis"]["b4"]["conv1"]["weight"]),
        np.asarray(tiny_params["synthesis"]["b4"]["conv1"]["weight"]),
    )
    assert np.allclose(
        np.asarray(blended["synthesis"]["b16"]["conv1"]["weight"]),
        np.asarray(p2["synthesis"]["b16"]["conv1"]["weight"]),
    )
    img = sg2.generator(blended, np.random.RandomState(0).randn(1, 32).astype(np.float32), CFG)
    assert np.all(np.isfinite(np.asarray(img)))

    dirs, svals = analysis.sefa(tiny_params, CFG, n_components=4)
    assert dirs.shape == (4, 32)
    assert np.all(np.asarray(svals)[:-1] >= np.asarray(svals)[1:])  # descending


def test_nca():
    from maua_tpu import nca

    params = nca.init_params(jax.random.PRNGKey(0))
    x = nca.seed(2, sz=16)
    y = nca.ca_step(params, x, jax.random.PRNGKey(1))
    assert y.shape == x.shape
    final, frames = nca.rollout(params, x, 5, jax.random.PRNGKey(2))
    assert frames.shape == (5, 2, 16, 16, 3)
    # zero-init w2 -> state stays unchanged until trained
    assert np.allclose(np.asarray(y), np.asarray(x))


def test_nca_training_reduces_loss():
    from maua_tpu.nca import nca as nca_mod

    style = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    params = nca_mod.train_nca(style, n_steps=3, rollout_steps=(2, 4), batch=2, size=16,
                               pool_size=4, verbose=False)
    assert params is not None
    w2 = np.asarray(params["w2"])
    assert not np.allclose(w2, 0)  # trained away from zero init


def test_cli_usage(capsys):
    from maua_tpu.cli.entrypoint import main

    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "diffusion" in out and "audiovisual" in out
    assert main(["nonsense"]) == 1


# ------------------------------------------------- discriminator loading


def _synthetic_ada_d_state_dict(rs):
    """ADA-layout (OIHW / torch-FC) discriminator tensors at res 16:
    channels 16->8, 8->16, 4->32 (channel_base=128, channel_max=32)."""
    sd = {}
    sd["b16.fromrgb.weight"] = rs.randn(8, 3, 1, 1)
    sd["b16.fromrgb.bias"] = rs.randn(8)
    sd["b16.conv0.weight"] = rs.randn(8, 8, 3, 3)
    sd["b16.conv0.bias"] = rs.randn(8)
    sd["b16.conv1.weight"] = rs.randn(16, 8, 3, 3)
    sd["b16.conv1.bias"] = rs.randn(16)
    sd["b16.skip.weight"] = rs.randn(16, 8, 1, 1)
    sd["b8.conv0.weight"] = rs.randn(16, 16, 3, 3)
    sd["b8.conv0.bias"] = rs.randn(16)
    sd["b8.conv1.weight"] = rs.randn(32, 16, 3, 3)
    sd["b8.conv1.bias"] = rs.randn(32)
    sd["b8.skip.weight"] = rs.randn(32, 16, 1, 1)
    sd["b4.conv.weight"] = rs.randn(32, 33, 3, 3)  # +1 mbstd channel
    sd["b4.conv.bias"] = rs.randn(32)
    sd["b4.fc.weight"] = rs.randn(32, 32 * 16)
    sd["b4.fc.bias"] = rs.randn(32)
    sd["b4.out.weight"] = rs.randn(1, 32)
    sd["b4.out.bias"] = rs.randn(1)
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_load_discriminator_conversion(tmp_path):
    import torch

    from maua_tpu.gan import discriminator as D
    from maua_tpu.gan.load import load_discriminator

    sd = _synthetic_ada_d_state_dict(np.random.RandomState(0))
    path = str(tmp_path / "ckpt.pt")
    torch.save({"D": {k: torch.from_numpy(v) for k, v in sd.items()}, "G_ema": {}}, path)

    params, cfg = load_discriminator(path)
    assert cfg.img_resolution == 16
    assert cfg.channel_max == 32 and cfg.channel_base == 128
    assert cfg.mbstd_num_channels == 1
    assert cfg.channels(16) == 8 and cfg.channels(8) == 16 and cfg.channels(4) == 32

    img = jnp.asarray(np.random.RandomState(1).randn(5, 16, 16, 3).astype(np.float32))
    logits = D.discriminator(params, img, cfg)
    assert logits.shape == (5, 1)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_fc_flatten_permutation(tmp_path):
    """The b4 FC weight must be re-permuted from torch (C, H, W) flatten
    order to NHWC (H, W, C): a weight that reads exactly one (c, h, w)
    input coordinate must read the same coordinate after conversion."""
    from maua_tpu.gan.load import d_params_from_state_dict, infer_d_config

    sd = _synthetic_ada_d_state_dict(np.random.RandomState(2))
    c4 = 32
    w = np.zeros((c4, c4 * 16), np.float32)
    c_pick, h_pick, w_pick = 5, 2, 3
    w[0, c_pick * 16 + h_pick * 4 + w_pick] = 1.0  # torch flat index of (c, h, w)
    sd["b4.fc.weight"] = w
    params = d_params_from_state_dict(sd, infer_d_config(sd))
    ours = np.asarray(params["b4"]["fc"]["w"])  # (16*c4 HWC, c4)
    nhwc_flat = h_pick * (4 * c4) + w_pick * c4 + c_pick
    assert ours[nhwc_flat, 0] == 1.0
    assert ours.sum() == 1.0


def test_langevin_discriminator_energy(tiny_params):
    """DDLS energy through a live G+D pair is differentiable and drives
    the langevin chain (random-init nets; checks plumbing, not FID)."""
    from maua_tpu.gan import discriminator as D
    from maua_tpu.gan.sampling import discriminator_energy, langevin_sample
    from maua_tpu.gan.wrappers import StyleGAN2

    gen = StyleGAN2(cfg=CFG, params=tiny_params)
    d_cfg = D.D2Config(img_resolution=16, channel_base=128, channel_max=32)
    d_params = D.init_params(jax.random.PRNGKey(3), d_cfg)
    energy = discriminator_energy(gen, d_params, d_cfg)
    e = energy(jnp.zeros((2, CFG.z_dim)))
    assert e.shape == (2,) and np.all(np.isfinite(np.asarray(e)))
    z = langevin_sample(jax.random.PRNGKey(4), 2, energy, z_dim=CFG.z_dim, n_steps=2)
    assert z.shape == (2, CFG.z_dim)
    assert np.all(np.isfinite(np.asarray(z)))


def test_langevin_critic_requires_checkpoint(tiny_params):
    from maua_tpu.gan.wrappers import StyleGAN2

    gen = StyleGAN2(cfg=CFG, params=tiny_params)
    with pytest.raises(ValueError, match="checkpoint"):
        sampling.sample_latents("langevin", jax.random.PRNGKey(0), 2, generator=gen,
                                critic="discriminator")


def test_generate_images_class_and_transforms(tiny_params):
    from maua_tpu.gan.wrappers import StyleGAN2

    gen = StyleGAN2(cfg=CFG, params=tiny_params)
    with pytest.raises(ValueError, match="unconditional"):
        analysis.generate_images(gen, seeds="0,1", class_idx=3)
    imgs = analysis.generate_images(gen, seeds="0,1", translation=(0.1, -0.1), rotation=5.0,
                                    batch_size=2)
    assert imgs.shape == (2, 16, 16, 3)

    # conditional path: one-hot class conditioning reaches the mapper
    ccfg = sg2.SG2Config(img_resolution=16, z_dim=32, w_dim=32, c_dim=4,
                         channel_base=512, channel_max=32, num_fp16_res=0)
    cgen = StyleGAN2(cfg=ccfg, params=sg2.init_params(jax.random.PRNGKey(5), ccfg))
    a = analysis.generate_images(cgen, seeds="0,1", class_idx=0, batch_size=2)
    b = analysis.generate_images(cgen, seeds="0,1", class_idx=2, batch_size=2)
    assert a.shape == (2, 16, 16, 3)
    assert not np.allclose(a, b)


def test_generate_images_seed_range_count(tiny_params, monkeypatch):
    """'0-8' must produce 8 latents for non-random strategies too
    (the count comes from the parsed seed list, not the comma count)."""
    from maua_tpu.gan.wrappers import StyleGAN2

    gen = StyleGAN2(cfg=CFG, params=tiny_params)
    seen = {}
    orig = sampling.sample_latents

    def spy(strategy, key, n, *a, **kw):
        seen["n"] = n
        return orig(strategy, key, n, *a, **kw)

    monkeypatch.setattr("maua_tpu.gan.sampling.sample_latents", spy)
    imgs = analysis.generate_images(gen, seeds="0-8", sampling_strategy="polarity", batch_size=4)
    assert seen["n"] == 8
    assert imgs.shape[0] == 8
