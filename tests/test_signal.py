"""Golden tests for maua_tpu.ops.signal against torch oracles that
reproduce the reference semantics (reference: audioreactive/signal.py).
"""

import numpy as np
import pytest

import maua_tpu.ops.signal as sig


def test_resample_matches_torch_linear():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).rand(100, 4).astype(np.float32)
    out = np.asarray(sig.resample_1d(x, 250))
    tx = torch.from_numpy(x).permute(1, 0)[None]
    ref = torch.nn.functional.interpolate(tx, size=250, mode="linear", align_corners=False)
    ref = ref[0].permute(1, 0).numpy()
    assert np.allclose(out, ref, atol=1e-5)


def test_resample_1d_shape_and_downsample():
    x = np.linspace(0, 1, 1000).astype(np.float32)
    out = np.asarray(sig.resample_1d(x, 100))
    assert out.shape == (100,)
    assert np.all(np.diff(out) > 0)


def test_normalize():
    x = np.random.RandomState(1).randn(50).astype(np.float32)
    y = np.asarray(sig.normalize(x))
    assert abs(y.min()) < 1e-7 and abs(y.max() - 1) < 1e-6


def test_percentile_matches_kthvalue():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(2).rand(997).astype(np.float32)
    for p in [10, 50, 90, 95]:
        k = 1 + round(0.01 * p * (x.size - 1))
        ref = torch.from_numpy(x).view(-1).kthvalue(k).values.item()
        assert np.isclose(float(sig.percentile(x, p)), ref)


def test_percentile_clip_range_and_clipping():
    rs = np.random.RandomState(3)
    x = np.abs(rs.randn(500)).astype(np.float32)
    x[100] = 50.0  # huge outlier peak
    y = np.asarray(sig.percentile_clip(x, 90))
    assert y.max() <= 1.0 + 1e-6
    # outlier must have been clipped relative to its raw dominance
    assert y[100] <= 1.0 + 1e-6
    assert np.sum(y > 0.9) > 1  # other values now near max too


def test_percentile_clip_multichannel():
    rs = np.random.RandomState(4)
    x = np.abs(rs.randn(300, 3)).astype(np.float32)
    y = np.asarray(sig.percentile_clip(x, 95))
    assert y.shape == (300, 3)
    assert np.allclose(y.max(axis=0), 1.0, atol=1e-5)


def test_compress():
    x = np.array([0.1, 0.5, 0.9, 1.5], dtype=np.float32)
    y = np.asarray(sig.compress(x, threshold=1.0, ratio=0.5))
    assert abs(y.max() - 1.0) < 1e-6 and abs(y.min()) < 1e-7


def test_gaussian_filter_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rs = np.random.RandomState(5)
    x = rs.rand(120, 6).astype(np.float32)
    sigma = 2.0
    out = np.asarray(sig.gaussian_filter(x, sigma))

    # oracle reproducing reference audioreactive/signal.py:108-157
    radius = min(int(sigma * 4), 3 * 120)
    kernel = torch.arange(-radius, radius + 1, dtype=torch.float32)
    kernel = torch.exp(-0.5 / sigma**2 * kernel**2)
    kernel = kernel / kernel.sum()
    tx = torch.from_numpy(x)[:, :, None].transpose(0, 2)  # (1, C, T)
    tx = F.pad(tx, (radius, radius), mode="circular")
    k = kernel.view(1, 1, -1).repeat(6, 1, 1)
    ref = F.conv1d(tx, weight=k, groups=6).transpose(0, 2)[:, :, 0].numpy()
    assert np.allclose(out, ref, atol=1e-5)


def test_gaussian_filter_causal_reduces_future_influence():
    x = np.zeros(100, dtype=np.float32)
    x[50] = 1.0
    smoothed = np.asarray(sig.gaussian_filter(x, 3.0, causal=0.0))
    # causal=0: the impulse should only leak forward in time
    assert smoothed[55] > 0
    assert smoothed[45] == pytest.approx(0.0, abs=1e-7)


def test_gaussian_filter_short_sequence():
    x = np.random.RandomState(6).rand(4, 2).astype(np.float32)
    out = np.asarray(sig.gaussian_filter(x, 10.0))
    assert out.shape == (4, 2)
    assert np.all(np.isfinite(out))
