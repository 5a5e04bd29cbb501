"""Tests for the BERT text encoder + GLID3XL conditioning
(reference: maua/diffusion/processors/glid3xl.py:152-270)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.text import bert

torch = pytest.importorskip("torch")

CFG = bert.BERTConfig(vocab_size=200, max_len=16, width=32, layers=2, heads=4)


def _torch_sd(cfg, seed=0):
    """x-transformers-style state dict (glid-3-xl bert.pt naming)."""
    g = torch.Generator().manual_seed(seed)
    w = cfg.width
    sd = {
        "transformer.token_emb.weight": torch.randn(cfg.vocab_size, w, generator=g) * 0.02,
        "transformer.pos_emb.emb.weight": torch.randn(cfg.max_len, w, generator=g) * 0.01,
        "transformer.norm.weight": torch.rand(w, generator=g) + 0.5,
        "transformer.norm.bias": torch.randn(w, generator=g) * 0.1,
    }
    for i in range(cfg.layers):
        a = f"transformer.attn_layers.layers.{2 * i}"
        f = f"transformer.attn_layers.layers.{2 * i + 1}"
        sd[f"{a}.0.weight"] = torch.rand(w, generator=g) + 0.5
        sd[f"{a}.0.bias"] = torch.randn(w, generator=g) * 0.1
        for n in ("to_q", "to_k", "to_v"):
            sd[f"{a}.1.{n}.weight"] = torch.randn(w, w, generator=g) / np.sqrt(w)
        sd[f"{a}.1.to_out.weight"] = torch.randn(w, w, generator=g) / np.sqrt(w)
        sd[f"{a}.1.to_out.bias"] = torch.randn(w, generator=g) * 0.1
        sd[f"{f}.0.weight"] = torch.rand(w, generator=g) + 0.5
        sd[f"{f}.0.bias"] = torch.randn(w, generator=g) * 0.1
        sd[f"{f}.1.net.0.proj.weight"] = torch.randn(4 * w, w, generator=g) / np.sqrt(w)
        sd[f"{f}.1.net.0.proj.bias"] = torch.randn(4 * w, generator=g) * 0.1
        sd[f"{f}.1.net.2.weight"] = torch.randn(w, 4 * w, generator=g) / np.sqrt(4 * w)
        sd[f"{f}.1.net.2.bias"] = torch.randn(w, generator=g) * 0.1
    return sd


def _torch_oracle(sd, tokens, cfg):
    F = torch.nn.functional
    x = sd["transformer.token_emb.weight"][torch.as_tensor(tokens)] + sd["transformer.pos_emb.emb.weight"][None]
    b, t, w = x.shape
    hd = w // cfg.heads
    for i in range(cfg.layers):
        a = f"transformer.attn_layers.layers.{2 * i}"
        f = f"transformer.attn_layers.layers.{2 * i + 1}"
        h = F.layer_norm(x, (w,), sd[f"{a}.0.weight"], sd[f"{a}.0.bias"])
        q = (h @ sd[f"{a}.1.to_q.weight"].T).view(b, t, cfg.heads, hd).transpose(1, 2)
        k = (h @ sd[f"{a}.1.to_k.weight"].T).view(b, t, cfg.heads, hd).transpose(1, 2)
        v = (h @ sd[f"{a}.1.to_v.weight"].T).view(b, t, cfg.heads, hd).transpose(1, 2)
        att = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), -1)
        o = (att @ v).transpose(1, 2).reshape(b, t, w)
        x = x + o @ sd[f"{a}.1.to_out.weight"].T + sd[f"{a}.1.to_out.bias"]
        h = F.layer_norm(x, (w,), sd[f"{f}.0.weight"], sd[f"{f}.0.bias"])
        h = F.gelu(h @ sd[f"{f}.1.net.0.proj.weight"].T + sd[f"{f}.1.net.0.proj.bias"])
        x = x + h @ sd[f"{f}.1.net.2.weight"].T + sd[f"{f}.1.net.2.bias"]
    return F.layer_norm(x, (w,), sd["transformer.norm.weight"], sd["transformer.norm.bias"]).numpy()


def test_encoder_matches_torch_oracle():
    sd = _torch_sd(CFG, seed=1)
    params = bert.params_from_torch({k: v.numpy() for k, v in sd.items()}, CFG)
    tokens = np.random.default_rng(2).integers(0, CFG.vocab_size, (2, CFG.max_len))
    want = _torch_oracle(sd, tokens, CFG)
    got = np.asarray(bert.encode(params, jnp.asarray(tokens), CFG))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tokenizer_vocab_file(tmp_path):
    vocab = ["[PAD]"] + [f"unused{i}" for i in range(99)] + ["[UNK]", "[CLS]", "[SEP]"] + [
        "hello", "world", "un", "##believ", "##able", "!"
    ]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    tok = bert.WordPieceTokenizer(str(path))
    ids = tok("Hello unbelievable world!", max_len=12)
    words = {w: i for i, w in enumerate(vocab)}
    assert ids[0] == words["[CLS]"]
    assert list(ids[1:6]) == [words["hello"], words["un"], words["##believ"], words["##able"], words["world"]]
    assert ids[6] == words["!"]
    assert ids[7] == words["[SEP]"]
    assert ids[8] == 0  # padded


def test_tokenizer_hash_fallback_stable():
    tok = bert.WordPieceTokenizer()
    a = tok("a red fox", max_len=10)
    b = tok("a red fox", max_len=10)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, tok("a blue fox", max_len=10))


def test_glid3xl_uses_bert_conditioning():
    from maua_tpu.diffusion.models.unet import UNetConfig
    from maua_tpu.diffusion.models.vae import VAEConfig
    from maua_tpu.diffusion.processors.glide import GLID3XL

    tiny_unet = UNetConfig(in_channels=4, out_channels=4, model_channels=16, channel_mult=(1, 2),
                           num_res_blocks=1, attention_resolutions=(2,), num_heads=2, context_dim=32)
    tiny_vae = VAEConfig(base_channels=8, channel_mult=(1, 2), num_res_blocks=1)
    g = GLID3XL(sampler="ddim", timesteps=3, unet_cfg=tiny_unet, vae_cfg=tiny_vae, image_size=32,
                key=jax.random.PRNGKey(0))
    assert g.bert.cfg.width == 32  # context dim matched to the UNet

    from maua_tpu.prompt import TextPrompt

    cond, uncond = g._ld.conditioning([TextPrompt("a fox")])
    assert cond.shape[-1] == 32
    assert not np.allclose(np.asarray(cond), np.asarray(uncond))

    img = jnp.zeros((1, 32, 32, 3))
    out = g.forward(img, [TextPrompt("a fox")], t_start=0.5, verbose=False)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))
