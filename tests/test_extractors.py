"""Golden tests: JAX metric extractors vs independent torch oracles.

The oracles re-implement the reference architectures with
torch.nn.functional (eval-mode BatchNorm, un-folded) directly from the
same random torch-style state dicts the converters consume — so a pass
means converter + folding + forward all match torch semantics
(`extractors/inception.py:26-35`, `extractors/swav.py:142-354`).
"""

import numpy as np
import pytest

from maua_tpu.gan import extractors as ex

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _unit(sd, conv_key, bn_key, x, stride=1, padding=0, eps=1e-3, relu=True):
    x = F.conv2d(x, torch.as_tensor(sd[f"{conv_key}.weight"]), stride=stride, padding=padding)
    x = F.batch_norm(
        x,
        torch.as_tensor(sd[f"{bn_key}.running_mean"]),
        torch.as_tensor(sd[f"{bn_key}.running_var"]),
        torch.as_tensor(sd[f"{bn_key}.weight"]),
        torch.as_tensor(sd[f"{bn_key}.bias"]),
        training=False,
        eps=eps,
    )
    return F.relu(x) if relu else x


def _iu(sd, name, x, stride=1, padding=0):
    return _unit(sd, f"{name}.conv", f"{name}.bn", x, stride, padding, eps=1e-3)


def _torch_inception(sd, x):
    ap = lambda t: F.avg_pool2d(t, 3, 1, 1, count_include_pad=False)

    def block_a(b, x):
        b1 = _iu(sd, f"{b}.branch1x1", x)
        b5 = _iu(sd, f"{b}.branch5x5_2", _iu(sd, f"{b}.branch5x5_1", x), padding=2)
        b3 = _iu(sd, f"{b}.branch3x3dbl_3", _iu(sd, f"{b}.branch3x3dbl_2", _iu(sd, f"{b}.branch3x3dbl_1", x), padding=1), padding=1)
        bp = _iu(sd, f"{b}.branch_pool", ap(x))
        return torch.cat([b1, b5, b3, bp], 1)

    def block_c(b, x):
        b1 = _iu(sd, f"{b}.branch1x1", x)
        b7 = _iu(sd, f"{b}.branch7x7_1", x)
        b7 = _iu(sd, f"{b}.branch7x7_2", b7, padding=(0, 3))
        b7 = _iu(sd, f"{b}.branch7x7_3", b7, padding=(3, 0))
        bd = _iu(sd, f"{b}.branch7x7dbl_1", x)
        bd = _iu(sd, f"{b}.branch7x7dbl_2", bd, padding=(3, 0))
        bd = _iu(sd, f"{b}.branch7x7dbl_3", bd, padding=(0, 3))
        bd = _iu(sd, f"{b}.branch7x7dbl_4", bd, padding=(3, 0))
        bd = _iu(sd, f"{b}.branch7x7dbl_5", bd, padding=(0, 3))
        bp = _iu(sd, f"{b}.branch_pool", ap(x))
        return torch.cat([b1, b7, bd, bp], 1)

    def block_e(b, x, pool):
        b1 = _iu(sd, f"{b}.branch1x1", x)
        b3 = _iu(sd, f"{b}.branch3x3_1", x)
        b3 = torch.cat([_iu(sd, f"{b}.branch3x3_2a", b3, padding=(0, 1)), _iu(sd, f"{b}.branch3x3_2b", b3, padding=(1, 0))], 1)
        bd = _iu(sd, f"{b}.branch3x3dbl_2", _iu(sd, f"{b}.branch3x3dbl_1", x), padding=1)
        bd = torch.cat([_iu(sd, f"{b}.branch3x3dbl_3a", bd, padding=(0, 1)), _iu(sd, f"{b}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
        pooled = F.max_pool2d(x, 3, 1, 1) if pool == "max" else ap(x)
        bp = _iu(sd, f"{b}.branch_pool", pooled)
        return torch.cat([b1, b3, bd, bp], 1)

    x = _iu(sd, "Conv2d_1a_3x3", x, stride=2)
    x = _iu(sd, "Conv2d_2a_3x3", x)
    x = _iu(sd, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = _iu(sd, "Conv2d_3b_1x1", x)
    x = _iu(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    for b in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = block_a(b, x)
    b3 = _iu(sd, "Mixed_6a.branch3x3", x, stride=2)
    bd = _iu(sd, "Mixed_6a.branch3x3dbl_3", _iu(sd, "Mixed_6a.branch3x3dbl_2", _iu(sd, "Mixed_6a.branch3x3dbl_1", x), padding=1), stride=2)
    x = torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)
    for b in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = block_c(b, x)
    b3 = _iu(sd, "Mixed_7a.branch3x3_2", _iu(sd, "Mixed_7a.branch3x3_1", x), stride=2)
    b7 = _iu(sd, "Mixed_7a.branch7x7x3_1", x)
    b7 = _iu(sd, "Mixed_7a.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _iu(sd, "Mixed_7a.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _iu(sd, "Mixed_7a.branch7x7x3_4", b7, stride=2)
    x = torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)
    x = block_e("Mixed_7b", x, pool="avg")
    x = block_e("Mixed_7c", x, pool="max")
    return x.mean(dim=(2, 3))


def _torch_swav(sd, x):
    ru = lambda ck, bk, t, s=1, p=0, relu=True: _unit(sd, ck, bk, t, s, p, eps=1e-5, relu=relu)
    x = ru("conv1", "bn1", x, s=2, p=3)
    x = F.max_pool2d(x, 3, 2, 1)
    for stage, n_blocks in enumerate(ex._R50_LAYERS):
        for i in range(n_blocks):
            pre = f"layer{stage + 1}.{i}"
            stride = 2 if (i == 0 and stage > 0) else 1
            y = ru(f"{pre}.conv1", f"{pre}.bn1", x)
            y = ru(f"{pre}.conv2", f"{pre}.bn2", y, s=stride, p=1)
            y = ru(f"{pre}.conv3", f"{pre}.bn3", y, relu=False)
            if i == 0:
                identity = ru(f"{pre}.downsample.0", f"{pre}.downsample.1", x, s=stride, relu=False)
            else:
                identity = x
            x = F.relu(y + identity)
    return x.mean(dim=(2, 3))


def test_inception_matches_torch_oracle():
    sd = ex.random_state_dict_inception(seed=1)
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (2, 151, 151, 3)).astype(np.float32)

    want = _torch_inception(sd, torch.as_tensor(img).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(ex.inception_forward(ex.inception_params_from_torch(sd), img))

    assert got.shape == (2, 2048)
    assert np.max(np.abs(got - want)) < 1e-3, np.max(np.abs(got - want))


def test_swav_matches_torch_oracle():
    sd = ex.random_state_dict_swav(seed=3)
    rng = np.random.default_rng(4)
    img = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)

    want = _torch_swav(sd, torch.as_tensor(img).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(ex.swav_forward(ex.swav_params_from_torch(sd), img))

    assert got.shape == (2, 2048)
    # random BN stats don't normalize, so 50 layers of residual adds
    # reach O(1e4) activations; rtol covers the float32 accumulation
    # there while atol is the <1e-3 criterion at checkpoint-like scale
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)


def test_swav_accepts_ddp_prefixed_state_dict():
    sd = ex.random_state_dict_swav(seed=5)
    pref = {f"module.{k}": v for k, v in sd.items()}
    p1 = ex.swav_params_from_torch(sd)
    p2 = ex.swav_params_from_torch(pref)
    np.testing.assert_array_equal(np.asarray(p1["conv1"]["w"]), np.asarray(p2["conv1"]["w"]))


def test_compute_metrics_accepts_named_extractor():
    from maua_tpu.gan.metrics import compute_metrics

    rng = np.random.default_rng(6)
    real = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    fake = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    out = compute_metrics(real, fake, extractor="swav", batch=8, nearest_k=2)
    assert np.isfinite(out["fid"]) and np.isfinite(out["kid"])


def test_compute_folder_with_cache(tmp_path, monkeypatch):
    """compute() reads reals from a folder, caches their features
    keyed by folder/extractor/n (`metrics/compute.py:104-117`), and
    consumes a fake-batch generator callable."""
    import os

    import numpy as np
    from PIL import Image

    from maua_tpu.gan import metrics

    monkeypatch.setattr("maua_tpu.utility.WORKSPACE", str(tmp_path / "ws"))

    real_dir = tmp_path / "reals"
    real_dir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray((rs.rand(16, 16, 3) * 255).astype(np.uint8)).save(str(real_dir / f"{i}.png"))

    calls = {"n": 0}

    def extractor(x):
        calls["n"] += 1
        return x.mean(axis=(1, 2))  # (B, 3) toy features

    def fake_batch():
        return rs.rand(4, 16, 16, 3).astype(np.float32)

    out = metrics.compute(str(real_dir), fake_batch, n_samples=6, extractor=extractor,
                          batch_size=4, nearest_k=2, size=16)
    assert np.isfinite(out["fid"]) and np.isfinite(out["kid"])
    n_after_first = calls["n"]

    cache_dir = os.path.join(str(tmp_path / "ws"), "cache")
    assert any("_real_" in f for f in os.listdir(cache_dir))

    # second run hits the real-feature cache: only fake batches extract
    out2 = metrics.compute(str(real_dir), fake_batch, n_samples=6, extractor=extractor,
                           batch_size=4, nearest_k=2, size=16)
    assert np.isfinite(out2["fid"])
    assert calls["n"] - n_after_first == 2  # two fake batches, zero real
