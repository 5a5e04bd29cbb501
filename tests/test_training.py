"""Tests for the GAN training step and multi-device dryrun
(reference: maua/GAN/training/trainer.py:206-257)."""

import numpy as np
import pytest

import jax

from maua_tpu.gan import stylegan2 as sg2
from maua_tpu.gan import training as tr
from maua_tpu.gan.discriminator import D2Config, discriminator, init_params as init_d


G_CFG = sg2.SG2Config(img_resolution=16, z_dim=32, w_dim=32, channel_base=512, channel_max=32, num_fp16_res=0)
D_CFG = D2Config(img_resolution=16, channel_base=512, channel_max=32, mbstd_group_size=2)
T_CFG = tr.TrainConfig(r1_interval=1, pl_interval=1)


def test_discriminator_shapes():
    params = init_d(jax.random.PRNGKey(0), D_CFG)
    img = np.random.RandomState(0).randn(4, 16, 16, 3).astype(np.float32)
    logits = discriminator(params, img, D_CFG)
    assert logits.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_train_step_updates_and_finite():
    state = tr.init_train_state(jax.random.PRNGKey(0), G_CFG, D_CFG, T_CFG)
    real = np.random.RandomState(1).randn(4, 16, 16, 3).astype(np.float32).clip(-1, 1)
    new_state, metrics = tr.train_step(state, real, jax.random.PRNGKey(2), G_CFG, D_CFG, T_CFG)
    assert int(new_state["step"]) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params actually moved
    before = np.asarray(state["g_params"]["mapping"]["fc0"]["w"])
    after = np.asarray(new_state["g_params"]["mapping"]["fc0"]["w"])
    assert not np.allclose(before, after)
    # EMA moved but less
    ema = np.asarray(new_state["g_ema"]["mapping"]["fc0"]["w"])
    assert not np.allclose(ema, after)
    assert np.abs(ema - before).max() < np.abs(after - before).max()


def test_losses():
    fake = np.array([[0.0], [2.0]], np.float32)
    real = np.array([[1.0], [-1.0]], np.float32)
    assert float(tr.g_logistic_loss(fake)) > 0
    assert float(tr.d_logistic_loss(real, fake)) > 0
    assert float(tr.g_bce_loss(fake)) > 0
    assert float(tr.d_bce_loss(real, fake)) > 0


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_multihost_mesh_helpers_single_host():
    import jax

    from maua_tpu.parallel.mesh import initialize_multihost, make_multihost_mesh

    # single-host: init is a documented no-op, mesh falls back to flat
    assert initialize_multihost() is False
    mesh = make_multihost_mesh()
    assert mesh.axis_names == ("data", "tensor")
    assert mesh.shape["data"] == len(jax.devices())
    assert mesh.shape["tensor"] == 1
