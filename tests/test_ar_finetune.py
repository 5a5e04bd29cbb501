"""Tests for RuDALL-E-style finetuning
(reference: maua/autoregressive/ru_dalle/finetune.py:115-407)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.autoregressive import finetune as ft
from maua_tpu.autoregressive import transformer

CFG = transformer.ARConfig(
    vocab_size=32, text_vocab_size=16, text_length=4, image_rows=3, image_cols=3,
    width=32, layers=2, heads=4,
)


def _toy_batches(n, b=2, seed=0):
    """A fixed toy caption/image token set (the reference's
    image+caption folder) — same few rows repeated so loss can drop."""
    rng = np.random.default_rng(seed)
    text = rng.integers(0, CFG.text_vocab_size, (b, CFG.text_length))
    img = rng.integers(0, CFG.vocab_size, (b, CFG.image_length)) + CFG.text_vocab_size
    row = np.concatenate([text, img], axis=1)
    for _ in range(n):
        yield row


def test_loss_decreases_on_toy_set():
    params = transformer.init_params(jax.random.PRNGKey(0), CFG)
    cfg = ft.FinetuneConfig(lr=3e-3, steps=30)
    new_params, losses = ft.finetune(params, _toy_batches(30), CFG, cfg, verbose=False)
    assert len(losses) == 30
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])


def test_freeze_pattern():
    """attn/ff weights stay frozen; embeddings/ln/head move
    (`finetune.py:148`)."""
    params = transformer.init_params(jax.random.PRNGKey(0), CFG)
    cfg = ft.FinetuneConfig(lr=1e-2, steps=5)
    new_params, _ = ft.finetune(params, _toy_batches(5), CFG, cfg, verbose=False)
    blk0, nblk0 = params["blocks"][0], new_params["blocks"][0]
    for frozen in ("qkv", "proj", "fc1", "fc2"):
        np.testing.assert_array_equal(np.asarray(blk0[frozen]["w"]), np.asarray(nblk0[frozen]["w"]))
    assert not np.array_equal(np.asarray(params["tok_emb"]), np.asarray(new_params["tok_emb"]))
    assert not np.array_equal(np.asarray(blk0["ln1"]["scale"]), np.asarray(nblk0["ln1"]["scale"]))


def test_quantized_adam_roundtrip_and_training():
    """int8 blockwise moments: state is actually int8, and training
    still reduces loss (the 8-bit Adam role)."""
    params = transformer.init_params(jax.random.PRNGKey(0), CFG)
    cfg = ft.FinetuneConfig(lr=3e-3, steps=20, adam8bit=True)
    state = ft.init_finetune_state(params, cfg)
    leaves = jax.tree_util.tree_leaves(state["opt"])
    assert any(l.dtype == jnp.int8 for l in leaves if hasattr(l, "dtype"))
    new_params, losses = ft.finetune(params, _toy_batches(20), CFG, cfg, verbose=False)
    assert losses[-1] < losses[0]


def test_gradient_checkpointing_matches():
    """remat produces the same loss/gradients as the plain path."""
    params = transformer.init_params(jax.random.PRNGKey(0), CFG)
    tokens = jnp.asarray(next(iter(_toy_batches(1))))
    l1, g1 = jax.value_and_grad(ft.finetune_loss)(params, tokens, CFG, remat=False)
    l2, g2 = jax.value_and_grad(ft.finetune_loss)(params, tokens, CFG, remat=True)
    assert abs(float(l1) - float(l2)) < 1e-5
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-4


def test_checkpoint_save_restore(tmp_path):
    params = transformer.init_params(jax.random.PRNGKey(0), CFG)
    cfg = ft.FinetuneConfig(lr=1e-3, steps=3)
    state = ft.init_finetune_state(params, cfg)
    for tokens in _toy_batches(3):
        state, _ = ft.finetune_step(state, jnp.asarray(tokens), CFG, cfg)
    path = str(tmp_path / "ckpt.npz")
    ft.save_checkpoint(path, state)
    fresh = ft.init_finetune_state(params, cfg)
    restored = ft.restore_checkpoint(path, fresh)
    assert int(restored["step"]) == 3
    a = jax.tree_util.tree_leaves(restored["params"])
    b = jax.tree_util.tree_leaves(state["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # resuming continues cleanly
    nxt, loss = ft.finetune_step(restored, jnp.asarray(next(iter(_toy_batches(1)))), CFG, cfg)
    assert np.isfinite(float(loss))


def test_train_text_weighting():
    params = transformer.init_params(jax.random.PRNGKey(0), CFG)
    tokens = jnp.asarray(next(iter(_toy_batches(1))))
    img_only = float(ft.finetune_loss(params, tokens, CFG, train_text=False))
    combined = float(ft.finetune_loss(params, tokens, CFG, train_text=True))
    assert np.isfinite(img_only) and np.isfinite(combined)
    assert img_only != combined
