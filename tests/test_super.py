"""Tests for super-resolution + frame interpolation
(reference: maua/super/)."""

import numpy as np
import pytest

import jax

from maua_tpu.super import rife
from maua_tpu.super.image import MODEL_NAMES, Upscaler, upscale_image
from maua_tpu.super.models import rrdbnet

TINY_RRDB = rrdbnet.RRDBConfig(num_feat=16, num_block=2, num_grow_ch=8)


def test_rrdb_shapes_and_scale():
    params = rrdbnet.init_params(jax.random.PRNGKey(0), TINY_RRDB)
    img = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    out = rrdbnet.forward(params, img, TINY_RRDB)
    assert out.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rrdb_converter_roundtrip():
    """Synthetic basicsr-style state dict converts to matching shapes."""
    rs = np.random.RandomState(1)
    cfg = TINY_RRDB
    sd = {}
    def add(name, ci, co):
        sd[f"{name}.weight"] = rs.randn(co, ci, 3, 3).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rs.randn(co).astype(np.float32) * 0.01
    nf, gc = cfg.num_feat, cfg.num_grow_ch
    add("conv_first", 3, nf)
    for b in range(cfg.num_block):
        for r in range(1, 4):
            for c in range(1, 6):
                ci = nf + (c - 1) * gc
                co = gc if c < 5 else nf
                add(f"body.{b}.rdb{r}.conv{c}", ci, co)
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        add(name, nf, nf)
    add("conv_last", nf, 3)
    params = rrdbnet.params_from_torch(sd, cfg)
    img = np.random.RandomState(2).rand(1, 8, 8, 3).astype(np.float32)
    out = rrdbnet.forward(params, img, cfg)
    assert out.shape == (1, 32, 32, 3)


def test_srvgg_shapes():
    cfg = rrdbnet.SRVGGConfig(num_feat=16, num_conv=4)
    params = rrdbnet.init_srvgg_params(jax.random.PRNGKey(1), cfg)
    img = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    out = rrdbnet.srvgg_forward(params, img, cfg)
    assert out.shape == (2, 32, 32, 3)


def test_upscaler_api_and_tiling(monkeypatch):
    from maua_tpu.super import image as sup_image

    monkeypatch.setitem(sup_image.MODEL_REGISTRY, "tiny", ("rrdb", TINY_RRDB))
    up = Upscaler("tiny")
    img = np.random.RandomState(0).rand(1, 12, 12, 3).astype(np.float32)
    out = np.asarray(up(img))
    assert out.shape == (1, 48, 48, 3)
    assert out.min() >= 0 and out.max() <= 1
    # tiled path agrees at the seams reasonably
    up_tiled = Upscaler("tiny", tile=8)
    out_t = np.asarray(up_tiled(img))
    assert out_t.shape == (1, 48, 48, 3)


def test_model_names_registry():
    assert "RealESRGAN-x4plus" in MODEL_NAMES
    assert len(MODEL_NAMES) >= 5


def test_rife_midpoint_and_interpolate():
    cfg = rife.RIFEConfig(base_channels=8, scales=2)
    params = rife.init_params(jax.random.PRNGKey(0), cfg)
    f0 = np.zeros((1, 32, 32, 3), np.float32)
    f1 = np.ones((1, 32, 32, 3), np.float32)
    mid = np.asarray(rife.midpoint(params, f0, f1, cfg))
    assert mid.shape == (1, 32, 32, 3)
    assert 0 <= mid.min() and mid.max() <= 1

    frames = np.stack([f0[0], f1[0], f0[0]])
    out = list(rife.interpolate(frames, factor=2, params=params, cfg=cfg))
    assert len(out) == 5  # 2 gaps * 2 + final
    assert out[0].shape == (32, 32, 3)
