"""Golden tests for LPIPS / PGG caffe zoo / NIMA perceptors and the
new grad modules (reference: maua/grad.py:179-217,
maua/perceptors/vgg_pgg.py, maua/perceptors/nima.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional

VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _rand_vgg16_sd(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    chans = [3, 64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    for n, idx in enumerate(VGG16_CONV_IDX):
        ci, co = chans[n], chans[n + 1]
        sd[f"features.{idx}.weight"] = torch.randn(co, ci, 3, 3, generator=g) * np.sqrt(2.0 / (ci * 9)) * 0.5
        sd[f"features.{idx}.bias"] = torch.randn(co, generator=g) * 0.01
    return sd


def _torch_vgg16_feats(sd, x, stages, shift=None, scale=None, caffe=False):
    """Oracle: torchvision-vgg16 conv stack; returns features at relu
    indices in `stages`. 4 pools (between the 5 blocks) like
    maua_tpu.perceptors.vgg/lpips."""
    layout = (2, 2, 3, 3, 3)
    feats = []
    i = 0
    conv_n = 0
    for block, n_convs in enumerate(layout):
        for _ in range(n_convs):
            idx = VGG16_CONV_IDX[conv_n]
            x = F.conv2d(x, sd[f"features.{idx}.weight"], sd[f"features.{idx}.bias"], padding=1)
            x = F.relu(x)
            if i in stages:
                feats.append(x)
            i += 1
            conv_n += 1
        if block < 4:
            x = F.max_pool2d(x, 2, 2)
    return feats, x


class TestLPIPS:
    def test_matches_torch_oracle(self):
        from maua_tpu.perceptors import lpips as lp

        vgg_sd = _rand_vgg16_sd(seed=1)
        g = torch.Generator().manual_seed(2)
        lin_sd = {f"lin{k}.model.1.weight": torch.rand(1, c, 1, 1, generator=g) * 0.1
                  for k, c in enumerate(lp.STAGE_CHANNELS)}
        params = lp.params_from_torch(
            {k: v.numpy() for k, v in lin_sd.items()}, {k: v.numpy() for k, v in vgg_sd.items()}
        )

        rng = np.random.default_rng(3)
        a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

        # torch oracle of the lpips forward
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def feats(img):
            x = (torch.as_tensor(img).permute(0, 3, 1, 2) - shift) / scale
            fs, _ = _torch_vgg16_feats(vgg_sd, x, lp.LPIPS_STAGES)
            return [f / torch.sqrt((f**2).sum(1, keepdim=True) + 1e-10) for f in fs]

        fa, fb = feats(a), feats(b)
        want = sum(
            ((x - y) ** 2 * lin_sd[f"lin{k}.model.1.weight"].clamp(min=0)).sum(1).mean((1, 2))
            for k, (x, y) in enumerate(zip(fa, fb))
        ).numpy()

        got = np.asarray(lp.lpips(params, jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_zero_for_identical_and_positive_otherwise(self):
        from maua_tpu.perceptors import lpips as lp

        params = lp.init_params(seed=4)
        rng = np.random.default_rng(5)
        a = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
        assert float(lp.lpips(params, a, a)[0]) < 1e-8
        b = np.clip(a + 0.5 * rng.standard_normal(a.shape).astype(np.float32), -1, 1)
        assert float(lp.lpips(params, a, b)[0]) > 0


class TestPGG:
    def test_caffe_vgg16_matches_torch_oracle(self):
        from maua_tpu.perceptors import pgg

        sd = _rand_vgg16_sd(seed=6)
        params = pgg.params_from_torch({k: v.numpy() for k, v in sd.items()})
        rng = np.random.default_rng(7)
        img = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)

        # oracle: BGR + caffe mean + x255, then the conv stack
        x01 = (torch.as_tensor(img).permute(0, 3, 1, 2) + 1) / 2
        mean = torch.tensor([103.939, 116.779, 123.68]).view(1, 3, 1, 1) / 255
        x = 255 * (x01[:, [2, 1, 0]] - mean)
        want, _ = _torch_vgg16_feats(sd, x, stages=(1, 3, 6, 9, 12))

        p = pgg.PGGPerceptor("vgg16", params=params)
        feats = p.get_features(jnp.asarray(img))
        for s, w in zip((1, 3, 6, 9, 12), want):
            got = np.asarray(feats[s]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, w.numpy(), rtol=1e-3, atol=1e-2)

    def test_nin_shapes_and_layers(self):
        from maua_tpu.perceptors import pgg

        p = pgg.PGGPerceptor("nin", key=jax.random.PRNGKey(8))
        img = jnp.zeros((1, 64, 64, 3))
        feats = p.get_features(img)
        assert len(feats) == len(pgg.NIN_SPEC)
        assert feats[0].shape[-1] == 96
        assert feats[-1].shape[-1] == 1000
        assert max(p.style_layers) < len(feats)

    def test_pruned_channels(self):
        from maua_tpu.perceptors import pgg

        p = pgg.PGGPerceptor("prune", key=jax.random.PRNGKey(9))
        feats = p.get_features(jnp.zeros((1, 32, 32, 3)))
        assert feats[0].shape[-1] == 24  # pruned first conv

    def test_load_perceptor_names(self):
        from maua_tpu.perceptors import load_perceptor

        for name in ("pgg-vgg16", "nin", "sod", "lpips"):
            assert load_perceptor(name) is not None


class TestNIMA:
    def test_matches_torch_oracle(self):
        from maua_tpu.perceptors import nima

        sd = _rand_vgg16_sd(seed=10)
        g = torch.Generator().manual_seed(11)
        sd["classifier.1.weight"] = torch.randn(10, 512 * 7 * 7, generator=g) * 0.001
        sd["classifier.1.bias"] = torch.randn(10, generator=g) * 0.1
        params = nima.params_from_torch({k: v.numpy() for k, v in sd.items()})

        rng = np.random.default_rng(12)
        img = rng.uniform(0, 1, (1, 224, 224, 3)).astype(np.float32)

        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = (torch.as_tensor(img).permute(0, 3, 1, 2) - mean) / std
        _, x = _torch_vgg16_feats(sd, x, stages=())
        x = F.max_pool2d(x, 2, 2)  # 5th block pool -> 7x7
        logits = x.flatten(1) @ sd["classifier.1.weight"].T + sd["classifier.1.bias"]
        want = torch.softmax(logits, -1).numpy()

        got = np.asarray(nima.distribution(params, jnp.asarray(img)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_score_range(self):
        from maua_tpu.perceptors import nima

        score, std = nima.nima_score(np.random.default_rng(13).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        assert 0.0 <= float(score) <= 9.0
        assert float(std) >= 0.0


class TestGradModules:
    def test_lpips_grads_pull_toward_target(self):
        from maua_tpu.grad import LPIPSGrads
        from maua_tpu.prompt import ContentPrompt

        rng = np.random.default_rng(14)
        target = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        gm = LPIPSGrads(scale=1.0)
        gm.set_targets([ContentPrompt(img=target)])
        img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        grad = gm(img, t=0)
        assert grad.shape == img.shape
        assert float(jnp.max(jnp.abs(grad))) > 0
        # zero at the target itself
        g0 = gm(jnp.asarray(gm.target), t=0)
        assert float(jnp.max(jnp.abs(g0))) < 1e-6

    def test_ssim_identity_and_degradation(self):
        from maua_tpu.grad import ssim

        rng = np.random.default_rng(15)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
        assert abs(float(ssim(x, x)) - 1.0) < 1e-5
        y = x + 0.5 * jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
        assert float(ssim(x, y)) < 1.0

    def test_latent_ssim_grads(self):
        from maua_tpu.grad import LatentSSIMGrads
        from maua_tpu.prompt import ContentPrompt

        rng = np.random.default_rng(16)
        target_img = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        encode = lambda im: jnp.asarray(im[..., :1].repeat(4, axis=-1)) * 5.0  # fake encoder to 4ch
        gm = LatentSSIMGrads(scale=1.0, encode_fn=encode)
        gm.set_targets([ContentPrompt(img=target_img)])
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
        grad = gm(x, t=0)
        assert grad.shape == x.shape
        assert np.all(np.isfinite(np.asarray(grad)))
        assert float(jnp.max(jnp.abs(grad))) > 0


def test_vgg_pooling_variants_and_name_arch():
    """KBC pooling options with activation-scale correction
    (`maua/perceptors/vgg_kbc.py:14-15,41-45`) and arch selection from
    the perceptor name."""
    from maua_tpu.perceptors import load_perceptor

    rng = np.random.default_rng(17)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))

    p16 = load_perceptor("kbc-vgg16")()
    assert p16.arch == "vgg16" and len(p16.get_features(img)) == 13

    feats = {}
    for pooling in ("max", "avg", "l2"):
        p = load_perceptor("kbc-vgg19")(pooling=pooling)
        f = p.get_features(img)
        assert len(f) == 16
        assert np.all(np.isfinite(np.asarray(f[-1])))
        feats[pooling] = np.asarray(f[-1])
    assert not np.allclose(feats["max"], feats["avg"])
    assert not np.allclose(feats["avg"], feats["l2"])

    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_perceptor("kbc-vgg19")(pooling="bogus")
