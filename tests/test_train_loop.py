"""Tests for the GAN training harness: data pipeline, augmentation,
fit loop with metric gating, checkpointing, plugin CLI
(reference: maua/GAN/training/)."""

import os

import numpy as np
import pytest

import jax

from maua_tpu.gan import training as tr
from maua_tpu.gan import stylegan2 as sg2
from maua_tpu.gan.data import ImageDataset, augment_batch, build_cache
from maua_tpu.gan.discriminator import D2Config
from maua_tpu.gan.train_cli import REGISTRY, build_by_name
from maua_tpu.gan.train_loop import FitConfig, fit, load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rs = np.random.RandomState(0)
    for i in range(12):
        Image.fromarray((rs.rand(40, 48, 3) * 255).astype(np.uint8)).save(d / f"{i}.png")
    return str(d)


def test_build_cache_and_dataset(image_dir):
    cache = build_cache(image_dir, 16)
    assert os.path.exists(cache)
    ds = ImageDataset(cache, batch_size=4)
    assert len(ds) == 3
    batch = next(iter(ds))
    assert batch.shape == (4, 16, 16, 3)
    assert -1.01 <= float(batch.min()) and float(batch.max()) <= 1.01


def test_dataset_prefetch_matches_sync(image_dir):
    cache = build_cache(image_dir, 16)
    sync = [np.asarray(b) for b in ImageDataset(cache, batch_size=4, seed=7, prefetch=0)]
    pref = [np.asarray(b) for b in ImageDataset(cache, batch_size=4, seed=7, prefetch=2)]
    assert len(sync) == len(pref) == 3
    for a, b in zip(sync, pref):
        assert np.array_equal(a, b)
    # abandoning the iterator early must not wedge the producer thread
    import threading

    before = threading.active_count()
    it = iter(ImageDataset(cache, batch_size=4, seed=7, prefetch=1))
    next(it)
    it.close()
    assert threading.active_count() <= before + 1


def test_augment_batch():
    rs = np.random.RandomState(1)
    batch = rs.rand(8, 16, 16, 3).astype(np.float32) * 2 - 1
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), batch, p_flip=1.0, p_translate=1.0))
    assert out.shape == batch.shape
    assert not np.allclose(out, batch)


def test_checkpoint_roundtrip(tmp_path):
    g_cfg = sg2.SG2Config(img_resolution=16, z_dim=16, w_dim=16, channel_base=256, channel_max=16, num_fp16_res=0)
    d_cfg = D2Config(img_resolution=16, channel_base=256, channel_max=16, mbstd_group_size=2)
    state = tr.init_train_state(jax.random.PRNGKey(0), g_cfg, d_cfg, tr.TrainConfig())
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)
    a = np.asarray(jax.device_get(state["g_params"]["mapping"]["fc0"]["w"]))
    b = np.asarray(restored["g_params"]["mapping"]["fc0"]["w"])
    assert np.allclose(a, b)


def test_fit_smoke(image_dir, tmp_path):
    cache = build_cache(image_dir, 16)
    ds = ImageDataset(cache, batch_size=4)
    g_cfg = sg2.SG2Config(img_resolution=16, z_dim=16, w_dim=16, channel_base=256, channel_max=16, num_fp16_res=0)
    d_cfg = D2Config(img_resolution=16, channel_base=256, channel_max=16, mbstd_group_size=2)
    state = fit(
        ds, g_cfg, d_cfg, tr.TrainConfig(r1_interval=4, pl_interval=4),
        FitConfig(total_steps=4, eval_every=4, log_every=2, n_eval_images=8, out_dir=str(tmp_path)),
        verbose=False,
    )
    assert int(jax.device_get(state["step"])) == 4
    assert os.path.exists(tmp_path / "ckpt_final")
    grids = [f for f in os.listdir(tmp_path) if f.startswith("grid_")]
    assert grids


def test_plugin_registry():
    assert "stylegan2" in REGISTRY["models"]
    assert "softplus" in REGISTRY["losses"]

    class Args:
        resolution = 32
        channel_base = 512
        channel_max = 32

    g, d = build_by_name("models", "stylegan2", Args())
    assert g.img_resolution == 32
    assert build_by_name("losses", "softplus", Args()) == "logistic"
    with pytest.raises(ValueError):
        build_by_name("models", "nonexistent", Args())
