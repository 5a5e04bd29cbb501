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


def test_build_cache_jpeg_and_cache_dir(image_dir, tmp_path):
    """`--cache_dir` relocates the cache; `--jpeg_quality` round-trips
    pixels through JPEG (reference beton cache stores jpegs)."""
    from maua_tpu.gan.data import build_cache as bc

    cache = bc(image_dir, 16, cache_dir=str(tmp_path), jpeg_quality=60)
    assert cache.startswith(str(tmp_path)) and "_q60_" in os.path.basename(cache)
    lossless = bc(image_dir, 16, cache_dir=str(tmp_path))
    a, b = np.load(cache), np.load(lossless)
    assert a.shape == b.shape
    assert not np.array_equal(a, b)  # jpeg round-trip changed pixels


def test_make_data_augment(image_dir):
    """Host-side data augmentations (`__main__.py:44-51` Input-data
    group): shape contract, rng reproducibility, identity when off."""
    from maua_tpu.gan.data import make_data_augment

    cache = build_cache(image_dir, 32)
    data = np.asarray(np.load(cache)[:4])
    aug = make_data_augment(16, hflip=True, random_crop=True, random_rotate=True)
    out = aug(data, np.random.default_rng(0))
    assert out.shape == (4, 16, 16, 3) and out.dtype == np.uint8
    assert np.array_equal(out, aug(data, np.random.default_rng(0)))
    assert not np.array_equal(out, aug(data, np.random.default_rng(1)))
    ident = make_data_augment(32)(data, np.random.default_rng(0))
    assert np.array_equal(ident, data)


def test_train_cli_flag_surface(image_dir, tmp_path, monkeypatch):
    """The full reference flag surface (`maua/GAN/training/__main__.py:
    41-116`) plumbs through to the right configs: component selectors
    (-G/-D/-L/-EMA/-GL/-DL/-A), kimg durations, per-network lr, widths."""
    from maua_tpu.gan import train_cli, train_loop

    captured = {}

    def fake_fit(dataset, g_cfg, d_cfg, t_cfg, fit_cfg, **kw):
        captured.update(dataset=dataset, g=g_cfg, d=d_cfg, t=t_cfg, f=fit_cfg)

    monkeypatch.setattr(train_loop, "fit", fake_fit)
    train_cli.main([
        "--input_dir", image_dir, "--resolution", "16", "-e",
        "-G", "deepconvolutional", "-D", "stylehypermixer",
        "-DL", "softplus", "r1_penalty", "-GL", "softplus", "path_length_regularization",
        "-A", "blur", "-L", "uniform", "-EMA", "0.99",
        "--hflip", "--preprocess_image_size", "32", "--jpeg_quality", "80",
        "--cache_dir", str(tmp_path), "--num_workers", "0", "--batch_size", "4",
        "--kimg", "2", "--test_kimg", "1", "--ckpt_kimg", "1", "--ckpt_top_k", "3",
        "--n_D_steps", "2", "--lr_G", "1e-3", "--lr_D", "2e-3",
        "--z_dim", "32", "--ngf", "16", "--ndf", "24",
        "--monitor_metric", "kid", "--out_dir", str(tmp_path / "out"),
    ])
    t = captured["t"]
    assert t.n_d_steps == 2 and t.latent == "uniform" and t.ema_beta == 0.99
    assert t.g_lr == 1e-3 and t.d_lr == 2e-3
    assert t.r1_gamma > 0 and t.pl_weight > 0 and t.blur_init_sigma > 0
    f = captured["f"]
    steps_per_kimg = 1000 // 4
    assert f.total_steps == 2 * steps_per_kimg
    assert f.eval_every == steps_per_kimg and f.ckpt_every == steps_per_kimg
    assert f.ckpt_top_k == 3 and f.monitor_metric == "kid"
    g, d = captured["g"], captured["d"]
    assert g.family == "dcgan" and d.family == "hypermixer"
    assert g.z_dim == 32 and g.base == 16 and d.d_base == 24
    assert captured["dataset"].data_augment is not None


def test_train_cli_experimental_gate(image_dir):
    from maua_tpu.gan import train_cli

    with pytest.raises(SystemExit):
        train_cli.main(["--input_dir", image_dir, "-G", "steerable"])


def test_fit_ckpt_top_k(image_dir, tmp_path):
    """Periodic scored checkpoints keep only the top-k by monitor
    metric (`--ckpt_kimg`/`--ckpt_top_k`, ModelCheckpoint role)."""
    cache = build_cache(image_dir, 16)
    ds = ImageDataset(cache, batch_size=4)
    g_cfg = sg2.SG2Config(img_resolution=16, z_dim=16, w_dim=16, channel_base=256, channel_max=16, num_fp16_res=0)
    d_cfg = D2Config(img_resolution=16, channel_base=256, channel_max=16, mbstd_group_size=2)
    fit(
        ds, g_cfg, d_cfg, tr.TrainConfig(r1_interval=4, pl_interval=4),
        FitConfig(total_steps=4, eval_every=2, ckpt_every=2, ckpt_top_k=1,
                  log_every=4, n_eval_images=8, out_dir=str(tmp_path)),
        verbose=False,
    )
    periodic = [f for f in os.listdir(tmp_path) if f.startswith("ckpt_0")]
    assert len(periodic) == 1  # two saved (steps 2 and 4), worst pruned


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
