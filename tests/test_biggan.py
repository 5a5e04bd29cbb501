"""Tests for the BigGAN IC-GAN backbone
(reference: maua/GAN/icgan/generate.py:90 + BigGAN-PyTorch arch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.gan import biggan

CFG = biggan.BigGANConfig(resolution=64, ch=8, dim_z=20, shared_dim=16,
                          instance_cond=True, feature_dim=32, attention_res=16)


def test_forward_shapes_and_conditioning():
    params = biggan.init_params(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, CFG.dim_z))
    f1 = jax.random.normal(jax.random.PRNGKey(2), (2, CFG.feature_dim))
    f2 = jax.random.normal(jax.random.PRNGKey(3), (2, CFG.feature_dim))
    out1 = biggan.generator(params, z, CFG, features=f1)
    out2 = biggan.generator(params, z, CFG, features=f2)
    assert out1.shape == (2, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out1)))
    assert np.abs(np.asarray(out1)).max() <= 1.0
    # instance features actually condition the output
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_hierarchical_z_chunks():
    """Later z chunks feed the per-block conditioning: changing ONLY a
    later chunk changes the output (hier z is live)."""
    params = biggan.init_params(jax.random.PRNGKey(0), CFG)
    f = jnp.zeros((1, CFG.feature_dim))
    z1 = jnp.zeros((1, CFG.dim_z))
    z2 = z1.at[0, CFG.z_chunk * 2].set(3.0)  # a block-2 chunk entry
    a = biggan.generator(params, z1, CFG, features=f)
    b = biggan.generator(params, z2, CFG, features=f)
    assert not np.allclose(np.asarray(a), np.asarray(b))


class TestConverter:
    def _synthetic_sd(self, seed=0):
        """BigGAN-PyTorch-style generator state dict with SN buffers."""
        torch = pytest.importorskip("torch")
        g = torch.Generator().manual_seed(seed)
        sd = {}

        def sn_linear(pre, ci, co, bias=True):
            w = torch.randn(co, ci, generator=g) / np.sqrt(ci)
            sd[f"{pre}.weight"] = w
            sd[f"{pre}.u0"] = torch.randn(1, co, generator=g)
            sd[f"{pre}.sv0"] = torch.linalg.matrix_norm(w, 2).reshape(1)
            if bias:
                sd[f"{pre}.bias"] = torch.randn(co, generator=g) * 0.01

        def sn_conv(pre, k, ci, co, bias=True):
            w = torch.randn(co, ci, k, k, generator=g) * np.sqrt(2.0 / (ci * k * k))
            sd[f"{pre}.weight"] = w
            sd[f"{pre}.sv0"] = torch.linalg.matrix_norm(w.reshape(co, -1), 2).reshape(1)
            if bias:
                sd[f"{pre}.bias"] = torch.randn(co, generator=g) * 0.01

        def ccbn(pre, ch):
            sn_linear(f"{pre}.gain", CFG.cond_dim, ch, bias=False)
            sn_linear(f"{pre}.bias", CFG.cond_dim, ch, bias=False)
            sd[f"{pre}.stored_mean"] = torch.randn(ch, generator=g) * 0.01
            sd[f"{pre}.stored_var"] = torch.rand(ch, generator=g) + 0.5

        in_m, out_m = CFG.arch
        sn_linear("linear", CFG.z_chunk, 4 * 4 * in_m[0] * CFG.ch)
        sn_linear("embed_features", CFG.feature_dim, CFG.shared_dim, bias=False)
        attn_block = int(np.log2(CFG.attention_res)) - 3
        for i in range(CFG.num_blocks):
            ci, co = in_m[i] * CFG.ch, out_m[i] * CFG.ch
            ccbn(f"blocks.{i}.0.bn1", ci)
            sn_conv(f"blocks.{i}.0.conv1", 3, ci, co)
            ccbn(f"blocks.{i}.0.bn2", co)
            sn_conv(f"blocks.{i}.0.conv2", 3, co, co)
            sn_conv(f"blocks.{i}.0.conv_sc", 1, ci, co)
            if i == attn_block:
                sn_conv(f"blocks.{i}.1.theta", 1, co, co // 8, bias=False)
                sn_conv(f"blocks.{i}.1.phi", 1, co, co // 8, bias=False)
                sn_conv(f"blocks.{i}.1.g", 1, co, co // 2, bias=False)
                sn_conv(f"blocks.{i}.1.o", 1, co // 2, co, bias=False)
                sd[f"blocks.{i}.1.gamma"] = torch.randn(1, generator=g) * 0.1
        last = out_m[-1] * CFG.ch
        sd["output_layer.0.gain"] = torch.rand(last, 1, 1, generator=g) + 0.5
        sd["output_layer.0.bias"] = torch.randn(last, 1, 1, generator=g) * 0.1
        sd["output_layer.0.stored_mean"] = torch.randn(last, generator=g) * 0.01
        sd["output_layer.0.stored_var"] = torch.rand(last, generator=g) + 0.5
        sn_conv("output_layer.2", 3, last, 3)
        return {k: v.numpy() for k, v in sd.items()}

    def test_convert_and_forward(self):
        sd = self._synthetic_sd()
        params = biggan.params_from_torch(sd, CFG)
        z = jax.random.normal(jax.random.PRNGKey(4), (2, CFG.dim_z))
        f = jax.random.normal(jax.random.PRNGKey(5), (2, CFG.feature_dim))
        out = biggan.generator(params, z, CFG, features=f)
        assert out.shape == (2, 64, 64, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_sn_folding_matches_svd(self):
        sd = self._synthetic_sd()
        w = biggan._sn_fold(sd, "linear")
        # spectral norm of the folded weight is ~1
        assert abs(np.linalg.norm(w.reshape(w.shape[0], -1), 2) - 1.0) < 1e-3

    def test_ccbn_matches_torch(self):
        torch = pytest.importorskip("torch")
        sd = self._synthetic_sd()
        params = biggan.params_from_torch(sd, CFG)
        ch = CFG.arch[0][0] * CFG.ch
        x = np.random.default_rng(6).standard_normal((2, 4, 4, ch)).astype(np.float32)
        y = np.random.default_rng(7).standard_normal((2, CFG.cond_dim)).astype(np.float32)

        got = np.asarray(biggan._apply_ccbn(params["blocks"][0]["bn1"], jnp.asarray(x), jnp.asarray(y), CFG.bn_eps))

        # torch oracle of BigGAN's ccbn: F.batch_norm(stored stats) * (1+gain(y)) + bias(y)
        F = torch.nn.functional
        xt = torch.as_tensor(x).permute(0, 3, 1, 2)
        gain_w = torch.as_tensor(sd["blocks.0.0.bn1.gain.weight"]) / torch.as_tensor(sd["blocks.0.0.bn1.gain.sv0"])
        bias_w = torch.as_tensor(sd["blocks.0.0.bn1.bias.weight"]) / torch.as_tensor(sd["blocks.0.0.bn1.bias.sv0"])
        gain = (1 + torch.as_tensor(y) @ gain_w.T).view(2, -1, 1, 1)
        bias = (torch.as_tensor(y) @ bias_w.T).view(2, -1, 1, 1)
        xn = F.batch_norm(xt, torch.as_tensor(sd["blocks.0.0.bn1.stored_mean"]),
                          torch.as_tensor(sd["blocks.0.0.bn1.stored_var"]), None, None,
                          training=False, eps=CFG.bn_eps)
        want = (xn * gain + bias).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_icgan_biggan_backbone():
    from maua_tpu.gan.icgan import load_icgan

    gen = load_icgan(backbone="biggan", biggan_cfg=CFG, key=jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.dim_z))
    f = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.feature_dim))
    out = gen(z, f)
    assert out.shape == (1, 64, 64, 3)
