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
