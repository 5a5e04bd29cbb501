"""Tests for the SwinIR and waifu2x (UpConv_7 / CARN) SR architectures
(reference: maua/super/image/models/{swinir,waifu}.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.super.models import swinir, waifu

TINY = swinir.SwinIRConfig(
    embed_dim=16, depths=(2, 2), num_heads=(2, 2), window_size=4, num_feat=8
)


def test_swinir_shapes_and_scale():
    params = swinir.init_params(jax.random.PRNGKey(0), TINY)
    img = np.random.RandomState(0).rand(1, 16, 12, 3).astype(np.float32)
    out = swinir.forward(params, img, TINY)
    assert out.shape == (1, 64, 48, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_swinir_shift_mask_regions():
    """SW-MSA mask is 0 within a contiguous region and -100 across the
    wrap-around boundary created by the roll."""
    m = swinir._shift_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # first window (interior, all same region): fully unmasked
    assert np.all(m[0] == 0)
    # last window straddles both wrapped boundaries: has masked pairs
    assert np.any(m[-1] < 0)
    # mask is symmetric
    assert np.allclose(m, m.transpose(0, 2, 1))


def test_swin_attention_matches_numpy():
    """Window attention (incl. relative-position bias + shift mask)
    against a straightforward numpy reference."""
    rs = np.random.RandomState(1)
    ws, heads, c = 4, 2, 8
    n = ws * ws
    nw = 4  # windows (matching an 8x8 image)
    x = rs.randn(nw, n, c).astype(np.float32)
    p = {
        "qkv": {"w": rs.randn(c, 3 * c).astype(np.float32) * 0.1, "b": rs.randn(3 * c).astype(np.float32) * 0.1},
        "proj": {"w": rs.randn(c, c).astype(np.float32) * 0.1, "b": rs.randn(c).astype(np.float32) * 0.1},
        "rpb": rs.randn((2 * ws - 1) ** 2, heads).astype(np.float32) * 0.1,
    }
    mask = swinir._shift_mask(8, 8, ws, ws // 2)
    out = np.asarray(swinir._attention({k: jax.tree.map(jnp.asarray, v) for k, v in p.items()},
                                       jnp.asarray(x), heads, ws, mask))

    # numpy reference
    hd = c // heads
    idx = swinir._rel_pos_index(ws)
    bias = p["rpb"][idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)
    ref = np.zeros_like(x)
    for wi in range(nw):
        qkv = x[wi] @ p["qkv"]["w"] + p["qkv"]["b"]
        q, k, v = [qkv[:, i * c:(i + 1) * c].reshape(n, heads, hd).transpose(1, 0, 2) for i in range(3)]
        a = (q * hd ** -0.5) @ k.transpose(0, 2, 1) + bias + mask[wi][None]
        a = np.exp(a - a.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        o = (a @ v).transpose(1, 0, 2).reshape(n, c)
        ref[wi] = o @ p["proj"]["w"] + p["proj"]["b"]
    assert np.abs(out - ref).max() < 1e-4


def test_swinir_converter_roundtrip():
    """Synthetic official-layout state dict converts into a pytree with
    the same structure/shapes as init_params."""
    rs = np.random.RandomState(2)
    cfg = swinir.SwinIRConfig(embed_dim=16, depths=(2,), num_heads=(2,),
                              window_size=4, num_feat=8, resi_connection="3conv")
    d, nf, hidden = cfg.embed_dim, cfg.num_feat, int(cfg.embed_dim * cfg.mlp_ratio)
    sd = {}

    def add_conv(name, ci, co, k=3):
        sd[f"{name}.weight"] = rs.randn(co, ci, k, k).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rs.randn(co).astype(np.float32) * 0.01

    def add_lin(name, ci, co):
        sd[f"{name}.weight"] = rs.randn(co, ci).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rs.randn(co).astype(np.float32) * 0.01

    def add_ln(name, dim):
        sd[f"{name}.weight"] = np.ones(dim, np.float32)
        sd[f"{name}.bias"] = np.zeros(dim, np.float32)

    def add_3conv(base):
        add_conv(f"{base}.0", d, d // 4)
        add_conv(f"{base}.2", d // 4, d // 4, k=1)
        add_conv(f"{base}.4", d // 4, d)

    add_conv("conv_first", 3, d)
    add_ln("patch_embed.norm", d)
    for bi in range(2):
        base = f"layers.0.residual_group.blocks.{bi}"
        add_ln(f"{base}.norm1", d)
        add_lin(f"{base}.attn.qkv", d, 3 * d)
        add_lin(f"{base}.attn.proj", d, d)
        sd[f"{base}.attn.relative_position_bias_table"] = rs.randn((2 * 4 - 1) ** 2, 2).astype(np.float32)
        add_ln(f"{base}.norm2", d)
        add_lin(f"{base}.mlp.fc1", d, hidden)
        add_lin(f"{base}.mlp.fc2", hidden, d)
    add_3conv("layers.0.conv")
    add_ln("norm", d)
    add_3conv("conv_after_body")
    add_conv("conv_before_upsample.0", d, nf)
    for name in ("conv_up1", "conv_up2", "conv_hr"):
        add_conv(name, nf, nf)
    add_conv("conv_last", nf, 3)

    params = swinir.params_from_torch(sd, cfg)
    ref = swinir.init_params(jax.random.PRNGKey(0), cfg)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    out = swinir.forward(params, np.zeros((1, 8, 8, 3), np.float32), cfg)
    assert out.shape == (1, 32, 32, 3)


def test_upconv7_matches_torch():
    """UpConv_7 (valid convs + ConvTranspose2d(4,2,3) over replicate
    padding) against a torch mirror — pins down the transposed-conv
    edge semantics."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    params = waifu.init_upconv7_params(jax.random.PRNGKey(3))
    img = np.random.RandomState(4).rand(1, 12, 10, 3).astype(np.float32)
    out = np.asarray(waifu.upconv7_forward(params, img))
    assert out.shape == (1, 24, 20, 3)

    x = torch.from_numpy(img.transpose(0, 3, 1, 2))
    x = F.pad(x, (7, 7, 7, 7), mode="replicate")
    for i in range(6):
        w = torch.from_numpy(np.asarray(params[f"conv{i}"]["w"]).transpose(3, 2, 0, 1).copy())
        b = torch.from_numpy(np.asarray(params[f"conv{i}"]["b"]))
        x = F.leaky_relu(F.conv2d(x, w, b), 0.1)
    wd = torch.from_numpy(np.asarray(params["deconv"]["w"]).transpose(2, 3, 0, 1).copy())
    bd = torch.from_numpy(np.asarray(params["deconv"]["b"]))
    ref = F.conv_transpose2d(x, wd, bd, stride=2, padding=3).numpy().transpose(0, 2, 3, 1)
    assert ref.shape == out.shape
    assert np.abs(ref - out).max() < 1e-4


def test_upconv7_json_converter():
    rs = np.random.RandomState(5)
    layers = []
    for i in range(6):
        ci, co = waifu.UPCONV7_CHANNELS[i], waifu.UPCONV7_CHANNELS[i + 1]
        layers.append({"weight": rs.randn(co, ci, 3, 3).tolist(), "bias": rs.randn(co).tolist()})
    layers.append({"weight": rs.randn(256, 3, 4, 4).tolist(), "bias": rs.randn(3).tolist()})
    params = waifu.upconv7_params_from_json(layers)
    out = waifu.upconv7_forward(params, np.zeros((1, 8, 8, 3), np.float32))
    assert out.shape == (1, 16, 16, 3)


def test_carn_shapes():
    cfg = waifu.CARNConfig(mid=16, n_groups=2, n_blocks=2)
    params = waifu.init_carn_params(jax.random.PRNGKey(6), cfg)
    out = waifu.carn_forward(params, np.random.RandomState(7).rand(2, 8, 8, 3).astype(np.float32), cfg)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_registry_covers_reference_surface():
    """All 21 reference registry names resolve (single.py:18-41)."""
    from maua_tpu.super.image import MODEL_NAMES, MODEL_REGISTRY

    for name in ("latent-diffusion", "SwinIR-L-DFOWMFC-GAN", "SwinIR-M-DFO-PSNR",
                 "waifu2x-anime-noise0", "waifu2x-photo-noise3", "CARN", "BSRGAN", "RealSR"):
        assert name in MODEL_NAMES
    assert len(MODEL_NAMES) == 21
    kinds = {MODEL_REGISTRY[n][0] for n in MODEL_NAMES}
    assert kinds == {"ldm", "rrdb", "srvgg", "swinir", "upconv7", "carn"}


def test_upscaler_swinir_pads_to_window_multiple(monkeypatch):
    """The Upscaler mirror-pads non-multiple inputs (swinir.py:73-81)."""
    from maua_tpu.super import image as sup

    monkeypatch.setitem(sup.MODEL_REGISTRY, "SwinIR-M-DFO-GAN", ("swinir", TINY))
    up = sup.Upscaler("SwinIR-M-DFO-GAN")
    img = np.random.RandomState(8).rand(1, 10, 7, 3).astype(np.float32)
    out = up(jnp.asarray(img))
    assert out.shape == (1, 40, 28, 3)
    assert np.all(np.isfinite(np.asarray(out)))
