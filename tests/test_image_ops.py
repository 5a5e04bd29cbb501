"""Tests for maua_tpu.ops.image (reference: maua/ops/image.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

import maua_tpu.ops.image as imops


def test_smoothstep_endpoints():
    import jax.numpy as jnp

    x = jnp.linspace(0, 1, 11)
    y = np.asarray(imops.smoothstep(x))
    assert y[0] == pytest.approx(0.0)
    assert y[-1] == pytest.approx(1.0)
    assert np.all(np.diff(y) >= 0)


def test_destitch_restitch_roundtrip():
    rs = np.random.RandomState(0)
    img = rs.rand(1, 96, 128, 3).astype(np.float32)
    tiles = imops.destitch(img, tile_size=64)
    assert tiles.shape[1:] == (64, 64, 3)
    out = np.asarray(imops.restitch(tiles, 96, 128))
    assert out.shape == (1, 96, 128, 3)
    assert np.allclose(out, img, atol=1e-5)


def test_resample_shapes():
    img = np.random.RandomState(1).rand(2, 64, 48, 3).astype(np.float32)
    out = imops.resample(img, (32, 24))
    assert out.shape == (2, 32, 24, 3)
    out2 = imops.resample(img, 96)  # short side
    assert out2.shape == (2, 128, 96, 3)


def test_resample_preserves_constant():
    img = np.full((1, 32, 32, 3), 0.5, dtype=np.float32)
    out = np.asarray(imops.resample(img, (16, 16)))
    assert np.allclose(out, 0.5, atol=1e-5)


def test_original_colors_keeps_luma():
    rs = np.random.RandomState(2)
    content = rs.rand(1, 16, 16, 3).astype(np.float32)
    # keep generated near mid-gray so the merged YCbCr stays in gamut
    generated = (rs.rand(1, 16, 16, 3).astype(np.float32) * 0.2 + 0.4)
    out = np.asarray(imops.original_colors(content, generated))
    # Y (Rec.601 luma, first YCbCr channel) must come from `generated`
    y_out = np.asarray(imops.rgb_to_ycbcr(out))[..., 0]
    y_gen = np.asarray(imops.rgb_to_ycbcr(generated))[..., 0]
    assert np.abs(y_out - y_gen).mean() < 0.01
    # chroma must come from `content`
    c_out = np.asarray(imops.rgb_to_ycbcr(out))[..., 1:]
    c_src = np.asarray(imops.rgb_to_ycbcr(content))[..., 1:]
    assert np.abs(c_out - c_src).mean() < 0.05


def test_match_histogram_moves_stats():
    rs = np.random.RandomState(3)
    target = rs.rand(2, 24, 24, 3).astype(np.float32) * 0.3
    source = rs.rand(1, 24, 24, 3).astype(np.float32) * 0.8 + 0.2
    out = np.asarray(imops.match_histogram(target, source))
    assert out.shape == target.shape
    assert abs(out.mean() - source.mean()) < abs(target.mean() - source.mean())


def test_ycbcr_roundtrip():
    rs = np.random.RandomState(4)
    x = rs.rand(1, 8, 8, 3).astype(np.float32)
    rt = np.asarray(imops.ycbcr_to_rgb(imops.rgb_to_ycbcr(x)))
    assert np.allclose(rt, x, atol=1e-5)


def test_wrapping_slice():
    x = np.arange(10)[:, None].astype(np.float32)
    out = np.asarray(imops.wrapping_slice(x, 8, 5))
    assert list(out[:, 0]) == [8, 9, 0, 1, 2]


def test_local_std_constant_is_zero():
    img = np.full((1, 16, 16, 1), 0.7, dtype=np.float32)
    out = np.asarray(imops.local_std(img))
    assert np.allclose(out, 0.0, atol=1e-3)


def test_immerkaer_noise_estimate():
    """Immerkaer sigma estimate recovers the true noise level of a
    flat image + gaussian noise (`maua/ops/image.py:65-67`)."""
    import numpy as np

    rs = np.random.RandomState(0)
    sigma_true = 7.5
    img = 128.0 + sigma_true * rs.randn(2, 64, 64, 1)
    est = np.asarray(imops.immerkaer(jnp.asarray(img)))
    assert est.shape == (2,)
    assert np.all(np.abs(est - sigma_true) / sigma_true < 0.15)


def test_unsharp_mask_sharpens_and_thresholds():
    """Unsharp mask amplifies edges and leaves flat (low-contrast)
    regions bit-identical (`maua/ops/image.py:243-253`)."""
    import numpy as np

    img = np.full((1, 32, 32, 1), 100.0)
    img[:, :, 16:, :] = 180.0
    out = np.asarray(imops.unsharp_mask(jnp.asarray(img), amount=1.0, thresh=0.25))
    assert out.min() >= 0 and out.max() <= 255
    # edge overshoot on both sides
    assert out[0, 5, 15, 0] < 100 or out[0, 5, 16, 0] > 180
    # flat corners untouched
    assert out[0, 0, 0, 0] == 100 and out[0, -1, -1, 0] == 180


def test_color_balance_stretches_range():
    """Simplest color balance clips percentile tails and rescales each
    channel to the full [0, 255] range (`maua/ops/image.py:180-191`)."""
    import numpy as np

    rs = np.random.RandomState(1)
    img = 60.0 + 80.0 * rs.rand(40, 40, 3)
    out = np.asarray(imops.color_balance(jnp.asarray(img), percent=2.0))
    assert out.shape == img.shape
    assert out.min() == 0.0 and out.max() == 255.0
    # monotone per channel: ordering of clearly-separated pixels kept
    flat_in, flat_out = img[..., 0].ravel(), out[..., 0].ravel()
    i, j = np.argmin(flat_in), np.argmax(flat_in)
    assert flat_out[i] <= flat_out[j]


def test_blurriness_maps_rank_sharp_vs_blurred():
    """LBP and SVD blurriness maps distinguish a sharp texture from
    its blurred copy (`maua/ops/image.py:266-358`)."""
    import numpy as np

    rs = np.random.RandomState(2)
    sharp = rs.rand(48, 48).astype(np.float32)
    blurred = np.asarray(
        imops.gaussian_blur(jnp.asarray(sharp)[None, :, :, None], ks=(9, 9), sigma=3.0)
    )[0, :, :, 0]

    lbp_sharp = np.asarray(imops.blurriness_lbp(jnp.asarray(sharp), ks=7, thresh=0.016))
    lbp_blur = np.asarray(imops.blurriness_lbp(jnp.asarray(blurred), ks=7, thresh=0.016))
    assert lbp_sharp.shape == (48, 48)
    assert lbp_sharp.mean() > lbp_blur.mean()  # sharpness density higher on sharp

    svd_map = np.asarray(imops.blurriness_svd(jnp.asarray(sharp), kr=4, sv_num=3))
    assert svd_map.shape == (48, 48)
    assert np.all(np.isfinite(svd_map)) and svd_map.min() >= -1e-5 and svd_map.max() <= 1 + 1e-5
