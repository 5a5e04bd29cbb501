"""Tests for the functional StyleGAN2 generator
(reference: maua/GAN/wrappers/inference/stylegan2.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.gan import stylegan2 as sg2

CFG64 = sg2.SG2Config(img_resolution=64, channel_base=4096, channel_max=128, num_fp16_res=0)


@pytest.fixture(scope="module")
def gen64():
    return sg2.Generator(CFG64, key=jax.random.PRNGKey(42))


def test_num_ws():
    assert sg2.SG2Config(img_resolution=1024).num_ws == 18
    assert sg2.SG2Config(img_resolution=256).num_ws == 14
    assert CFG64.num_ws == 10


def test_generator_shapes(gen64):
    z = np.random.RandomState(0).randn(2, 512).astype(np.float32)
    img = gen64(z)
    assert img.shape == (2, 64, 64, 3)
    assert img.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(img)))


def test_mapping_broadcast_and_truncation(gen64):
    z = np.random.RandomState(1).randn(3, 512).astype(np.float32)
    ws = gen64.mapping(z)
    assert ws.shape == (3, CFG64.num_ws, 512)
    # all num_ws rows identical before truncation cutoff games
    assert np.allclose(np.asarray(ws[:, 0]), np.asarray(ws[:, -1]))
    # psi=0 collapses to w_avg
    ws0 = gen64.mapping(z, truncation_psi=0.0)
    w_avg = np.asarray(gen64.params["mapping"]["w_avg"])
    assert np.allclose(np.asarray(ws0), np.broadcast_to(w_avg, ws0.shape), atol=1e-6)
    # cutoff: only first rows truncated
    wsc = gen64.mapping(z, truncation_psi=0.0, truncation_cutoff=4)
    assert np.allclose(np.asarray(wsc[:, :4]), 0.0, atol=1e-6)
    assert np.allclose(np.asarray(wsc[:, 4:]), np.asarray(ws[:, 4:]))


def test_determinism_const_noise(gen64):
    z = np.random.RandomState(2).randn(1, 512).astype(np.float32)
    a = np.asarray(gen64(z))
    b = np.asarray(gen64(z))
    assert np.array_equal(a, b)


def test_random_noise_differs_from_const(gen64):
    z = np.random.RandomState(3).randn(1, 512).astype(np.float32)
    ws = gen64.mapping(z)
    a = np.asarray(gen64.synthesis(ws, noise_mode="const"))
    b = np.asarray(gen64.synthesis(ws, noise_mode="random", noise_key=jax.random.PRNGKey(7)))
    c = np.asarray(gen64.synthesis(ws, noise_mode="none"))
    assert not np.allclose(a, b)
    assert not np.allclose(a, c)


def test_explicit_noise_injection(gen64):
    z = np.random.RandomState(4).randn(2, 512).astype(np.float32)
    ws = gen64.mapping(z)
    noises = {}
    key = jax.random.PRNGKey(11)
    for res in CFG64.block_resolutions:
        convs = ["conv1"] if res == 4 else ["conv0", "conv1"]
        for cname in convs:
            key, sub = jax.random.split(key)
            noises[f"b{res}.{cname}"] = jax.random.normal(sub, (2, res, res, 1))
    a = np.asarray(gen64.synthesis(ws, noises=noises))
    assert a.shape == (2, 64, 64, 3)
    # zero explicit noise == noise_mode none
    zero_noises = {k: jnp.zeros_like(v) for k, v in noises.items()}
    b = np.asarray(gen64.synthesis(ws, noises=zero_noises))
    c = np.asarray(gen64.synthesis(ws, noise_mode="none"))
    assert np.allclose(b, c, atol=1e-5)


def test_w_styles_change_output(gen64):
    z1 = np.random.RandomState(5).randn(1, 512).astype(np.float32)
    z2 = np.random.RandomState(6).randn(1, 512).astype(np.float32)
    a = np.asarray(gen64(z1))
    b = np.asarray(gen64(z2))
    assert not np.allclose(a, b)


def test_resnet_architecture_runs():
    cfg = sg2.SG2Config(img_resolution=32, channel_base=2048, channel_max=64, architecture="resnet", num_fp16_res=0)
    gen = sg2.Generator(cfg, key=jax.random.PRNGKey(1))
    img = gen(np.random.RandomState(0).randn(1, 512).astype(np.float32))
    assert img.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_bf16_close_to_f32():
    cfg32 = sg2.SG2Config(img_resolution=32, channel_base=2048, channel_max=64, num_fp16_res=0)
    cfg16 = sg2.SG2Config(img_resolution=32, channel_base=2048, channel_max=64, num_fp16_res=10, dtype="bfloat16")
    params = sg2.init_params(jax.random.PRNGKey(3), cfg32)
    z = np.random.RandomState(0).randn(1, 512).astype(np.float32)
    a = np.asarray(sg2.generator(params, z, cfg32))
    b = np.asarray(sg2.generator(params, z, cfg16))
    assert np.abs(a - b).mean() < 0.1
