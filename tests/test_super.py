"""Tests for super-resolution + frame interpolation
(reference: maua/super/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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


def test_rdb_modes_agree():
    """The three RDB evaluation orders (input-grouped / stage-partial /
    materialized-concat) are the same linear map regrouped — in f32
    they must agree to roundoff. The grouped form is the production
    path (Co 192..64 instead of 32: MXU output-lane fill)."""
    params = rrdbnet.init_params(jax.random.PRNGKey(2), TINY_RRDB)
    blk = params["body"][0]["rdb1"]
    x = jnp.asarray(np.random.RandomState(3).randn(2, 12, 12, 16).astype(np.float32))
    outs = {name: np.asarray(fn(blk, x)) for name, fn in rrdbnet._RDB_MODES.items()}
    for name, out in outs.items():
        np.testing.assert_allclose(out, outs["concat"], rtol=1e-5, atol=1e-5, err_msg=name)


def test_fold_up2_conv_matches_resize_conv():
    """The 2x2 phase-kernel fold of nearest-up2 + 3x3 SAME conv must be
    exact (including borders, where the source zero-pad reproduces the
    doubled grid's SAME padding)."""
    rs = np.random.RandomState(4)
    p = {"w": jnp.asarray(rs.randn(3, 3, 6, 5).astype(np.float32)),
         "b": jnp.asarray(rs.randn(5).astype(np.float32))}
    x = jnp.asarray(rs.randn(2, 9, 7, 6).astype(np.float32))
    ref = rrdbnet.conv(p, rrdbnet._up2(x))
    out = rrdbnet._fold_up2_conv(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


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


def test_upscale_bulk_sharded_matches_single(monkeypatch):
    """Mesh-sharded bulk path yields the same outputs as per-image calls
    (`bulk.py:30-113` replacement)."""
    from maua_tpu.super import image as sup_image
    from maua_tpu.super.image import upscale_bulk_sharded

    monkeypatch.setitem(sup_image.MODEL_REGISTRY, "tiny", ("rrdb", TINY_RRDB))
    rs = np.random.RandomState(3)
    imgs = [rs.rand(1, 8, 8, 3).astype(np.float32) for _ in range(5)]
    outs = list(upscale_bulk_sharded(imgs, model_name="tiny", batch_size=4))
    assert len(outs) == 5
    ref = np.asarray(upscale_image(imgs[0], model=Upscaler("tiny")))
    assert outs[0].shape == ref.shape == (1, 32, 32, 3)
    assert np.abs(outs[0] - ref).max() < 1e-4


def test_video_upscale_and_interpolate(monkeypatch, tmp_path):
    """End-to-end video SR + RIFE framerate drivers over the cv2 IO
    path (`super/video/frame_by_frame.py:22-34`, `framerate/__init__.py`)."""
    from maua_tpu.ops.video import read_video, write_video
    from maua_tpu.super import image as sup_image
    from maua_tpu.super.video import interpolate_video, upscale_video

    monkeypatch.setitem(sup_image.MODEL_REGISTRY, "tiny", ("rrdb", TINY_RRDB))
    rs = np.random.RandomState(4)
    frames = rs.rand(4, 16, 16, 3).astype(np.float32)
    src = str(tmp_path / "in.mp4")
    write_video(frames, src, fps=8, value_range=(0, 1))

    out = upscale_video(src, str(tmp_path / "up.mp4"), model_name="tiny", batch_size=2)
    up_frames, fps = read_video(out)
    assert up_frames.shape[1:] == (64, 64, 3)
    assert up_frames.shape[0] >= 3

    cfg = rife.RIFEConfig(base_channels=8, scales=2)
    params = rife.init_params(jax.random.PRNGKey(0), cfg)
    out2 = interpolate_video(src, str(tmp_path / "interp.mp4"), factor=2, params=params, cfg=cfg)
    interp_frames, fps2 = read_video(out2)
    assert interp_frames.shape[0] >= 6
    assert abs(fps2 - 16) < 1.0

    # --slower/--decimate: out fps = fps * factor / slower / decimate
    # (`maua/cli/super.py:106-110`); decimate also drops frames
    out3 = interpolate_video(src, str(tmp_path / "dec.mp4"), factor=2, decimate=2,
                             params=params, cfg=cfg)
    dec_frames, fps3 = read_video(out3)
    assert abs(fps3 - 8) < 1.0
    assert dec_frames.shape[0] <= (interp_frames.shape[0] + 1) // 2 + 1
    out4 = interpolate_video(src, str(tmp_path / "slow.mp4"), factor=2, slower=2,
                             params=params, cfg=cfg)
    slow_frames, fps4 = read_video(out4)
    assert abs(fps4 - 8) < 1.0
    assert slow_frames.shape[0] == interp_frames.shape[0]


def test_srvgg_converter_roundtrip():
    """SRVGGNetCompact torch state dict -> pytree (regression: srvgg
    checkpoints were silently ignored, running random-init)."""
    import torch

    from maua_tpu.super.models import rrdbnet

    cfg = rrdbnet.SRVGGConfig(num_feat=8, num_conv=2, upscale=2)
    rng = np.random.RandomState(0)
    sd = {}
    chans = [(3, 8), (8, 8), (8, 8)]
    i = 0
    for ci, co in chans:
        sd[f"body.{i}.weight"] = torch.from_numpy(rng.randn(co, ci, 3, 3).astype(np.float32))
        sd[f"body.{i}.bias"] = torch.from_numpy(rng.randn(co).astype(np.float32))
        i += 1
        sd[f"body.{i}.weight"] = torch.from_numpy(rng.randn(co).astype(np.float32))
        i += 1
    sd[f"body.{i}.weight"] = torch.from_numpy(rng.randn(3 * 4, 8, 3, 3).astype(np.float32))
    sd[f"body.{i}.bias"] = torch.from_numpy(rng.randn(3 * 4).astype(np.float32))

    params = rrdbnet.srvgg_params_from_torch({k: v.numpy() for k, v in sd.items()}, cfg)
    assert len(params["convs"]) == 3 and len(params["prelu"]) == 3
    x = jnp.asarray(np.random.RandomState(1).rand(1, 12, 12, 3).astype(np.float32))
    y = rrdbnet.srvgg_forward(params, x, cfg)
    assert y.shape == (1, 24, 24, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_cli_comparison_subset(tmp_path):
    """`--comparison` runs the selected models side-by-side on one
    image (`maua/super/image/comparison.py` CLI role)."""
    import os

    from PIL import Image

    from maua_tpu.super import image as super_image

    rs = np.random.RandomState(0)
    p = str(tmp_path / "in.png")
    Image.fromarray((rs.rand(16, 16, 3) * 255).astype(np.uint8)).save(p)
    super_image.main([p, "--comparison", "--models", "RealESRGAN-x4plus", "waifu2x-photo-noise0",
                      "--out_dir", str(tmp_path)])
    outs = os.listdir(str(tmp_path / "in_comparison"))
    assert sorted(outs) == ["RealESRGAN-x4plus.png", "waifu2x-photo-noise0.png"]
