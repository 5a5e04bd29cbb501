"""Tests for the autoregressive subsystem
(reference: maua/autoregressive/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.autoregressive import oversample, transformer, video

CFG = transformer.ARConfig(
    vocab_size=64, text_vocab_size=32, text_length=4, image_rows=4, image_cols=4,
    width=32, layers=2, heads=4,
)


@pytest.fixture(scope="module")
def params():
    return transformer.init_params(jax.random.PRNGKey(0), CFG)


def test_forward_logits(params):
    tokens = jnp.zeros((2, CFG.total_length), jnp.int32)
    logits = transformer.forward(params, tokens, CFG)
    assert logits.shape == (2, CFG.total_length, CFG.total_vocab)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_generate_tokens(params):
    text = jnp.zeros((2, CFG.text_length), jnp.int32)
    toks = transformer.generate_tokens(params, text, CFG, jax.random.PRNGKey(1), top_k=8)
    assert toks.shape == (2, CFG.image_length)
    t = np.asarray(toks)
    assert t.min() >= 0 and t.max() < CFG.vocab_size


def test_generation_causality(params):
    """Changing the text prefix changes the samples (conditioning is
    live); same key + same prefix is deterministic."""
    k = jax.random.PRNGKey(2)
    t1 = jnp.zeros((1, CFG.text_length), jnp.int32)
    t2 = jnp.ones((1, CFG.text_length), jnp.int32)
    a = np.asarray(transformer.generate_tokens(params, t1, CFG, k))
    b = np.asarray(transformer.generate_tokens(params, t1, CFG, k))
    c = np.asarray(transformer.generate_tokens(params, t2, CFG, k))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_attention_masks():
    row = oversample.get_row_mask(CFG)
    col = oversample.get_col_mask(CFG)
    conv = oversample.get_conv_mask(CFG, kernel=3)
    t = CFG.total_length
    for m in (row, col, conv):
        assert m.shape == (t, t)
        assert not np.any(np.triu(m, 1))  # still causal
    # row mask: image queries attend at most one previous row
    q = CFG.text_length + 2 * CFG.image_cols + 1  # row 2, col 1
    attended_img = np.flatnonzero(row[q, CFG.text_length:])
    assert attended_img.min() >= CFG.image_cols  # nothing before row 1


def test_oversample_generate(params):
    text = jnp.zeros((1, CFG.text_length), jnp.int32)
    grid = oversample.oversample_generate(params, text, CFG, jax.random.PRNGKey(3),
                                          target_cols=7, overlap=2, top_k=8)
    assert grid.shape == (1, CFG.image_rows, 7)


def test_video_rolling_window(params):
    text = jnp.zeros((1, CFG.text_length), jnp.int32)
    frames = video.generate_video_tokens(params, text, CFG, n_frames=3, top_k=8)
    assert frames.shape == (3, 1, CFG.image_length)
    # successive frames differ (conditioning rolls forward)
    assert not np.array_equal(frames[0], frames[1])


def test_tp_sharded_generation(params):
    from maua_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, shape=(2, 4))
    text = jnp.zeros((2, CFG.text_length), jnp.int32)
    toks = video.sharded_generate(params, text, CFG, mesh, key=jax.random.PRNGKey(4), top_k=8)
    assert toks.shape == (2, CFG.image_length)
    # matches unsharded generation exactly
    ref = transformer.generate_tokens(params, text, CFG, jax.random.PRNGKey(4), top_k=8)
    assert np.array_equal(np.asarray(toks), np.asarray(ref))


def test_generate_tokens_teacher_forcing():
    """forced_tokens/forced_mask pin known positions (the oversampled
    decode overlap; regression: overlap columns never conditioned the
    next window)."""
    import jax.numpy as jnp

    cfg = CFG
    params = transformer.init_params(jax.random.PRNGKey(0), cfg)
    text = jnp.zeros((1, cfg.text_length), jnp.int32)
    n_img = cfg.image_length
    forced = jnp.asarray(np.arange(n_img, dtype=np.int32).reshape(1, -1) % (cfg.vocab_size - cfg.text_vocab_size))
    mask = np.zeros((n_img,), bool)
    mask[: n_img // 2] = True
    toks = transformer.generate_tokens(params, text, cfg, jax.random.PRNGKey(1),
                                       forced_tokens=forced, forced_mask=jnp.asarray(mask))
    out = np.asarray(toks)[0]
    assert np.array_equal(out[: n_img // 2], np.asarray(forced)[0, : n_img // 2])


def test_generate_tokens_cached_matches_recompute(params):
    """The default KV-cached decode samples identical tokens to the
    recompute-prefix formulation for the same key, including with
    teacher-forced positions and top_p."""
    text = jnp.zeros((2, CFG.text_length), jnp.int32)
    n_img = CFG.image_length
    forced = jnp.asarray(np.arange(n_img, dtype=np.int32).reshape(1, -1).repeat(2, 0) % CFG.vocab_size)
    fmask = np.zeros((n_img,), bool)
    fmask[::3] = True
    for kwargs in ({"top_k": 8}, {"top_k": 1}, {"top_k": 0, "top_p": 0.9},
                   {"top_k": 8, "forced_tokens": forced, "forced_mask": jnp.asarray(fmask)}):
        k = jax.random.PRNGKey(3)
        a = np.asarray(transformer.generate_tokens(params, text, CFG, k, cached=False, **kwargs))
        b = np.asarray(transformer.generate_tokens(params, text, CFG, k, cached=True, **kwargs))
        assert np.array_equal(a, b), kwargs
