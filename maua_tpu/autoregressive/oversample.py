"""Oversampled decoding for non-native aspect ratios + sparse
attention masks.

Rebuild of the ru-dalle first-party logic
(`maua/autoregressive/ru_dalle/generate.py:41-121`
oversample_generate_images, :124-172 attention mask builders): widen a
square-trained AR model by generating overlapping vertical strips and
blending, with row/col/conv sparse attention masks available for
models trained with them.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

import numpy as np

from .transformer import ARConfig, generate_tokens


def get_row_mask(cfg: ARConfig) -> np.ndarray:
    """Causal mask restricted to the previous image row + text
    (`ru_dalle/generate.py:124-139`)."""
    t = cfg.total_length
    mask = np.tril(np.ones((t, t), bool))
    for q in range(cfg.text_length, t):
        img_q = q - cfg.text_length
        lo = cfg.text_length + max(img_q - cfg.image_cols, 0)
        mask[q, cfg.text_length : lo] = False
    return mask


def get_col_mask(cfg: ARConfig) -> np.ndarray:
    """Causal mask attending the same column in previous rows
    (`ru_dalle/generate.py:141-155`)."""
    t = cfg.total_length
    mask = np.tril(np.ones((t, t), bool))
    for q in range(cfg.text_length, t):
        img_q = q - cfg.text_length
        qc = img_q % cfg.image_cols
        for k in range(cfg.text_length, q):
            img_k = k - cfg.text_length
            if img_k % cfg.image_cols != qc and (img_q - img_k) > cfg.image_cols:
                mask[q, k] = False
    return mask


def get_conv_mask(cfg: ARConfig, kernel: int = 11) -> np.ndarray:
    """Causal mask over a local 2D window (`ru_dalle/generate.py:157-172`)."""
    t = cfg.total_length
    mask = np.tril(np.ones((t, t), bool))
    r = kernel // 2
    for q in range(cfg.text_length, t):
        img_q = q - cfg.text_length
        qr, qc = divmod(img_q, cfg.image_cols)
        for k in range(cfg.text_length, q):
            img_k = k - cfg.text_length
            kr, kc = divmod(img_k, cfg.image_cols)
            if abs(kr - qr) > r or abs(kc - qc) > r:
                mask[q, k] = False
    return mask


def oversample_generate(
    params,
    text_tokens: jax.Array,
    cfg: ARConfig,
    key,
    target_cols: int,
    overlap: int = 4,
    temperature: float = 1.0,
    top_k: int = 64,
    decode_fn: Optional[Callable] = None,
) -> np.ndarray:
    """Generate a wider-than-native token grid by sliding the model
    over overlapping column windows and re-using shared columns
    (`ru_dalle/generate.py:41-121`).

    Returns the (B, rows, target_cols) token grid (decoded via
    decode_fn if given)."""
    rows, cols = cfg.image_rows, cfg.image_cols
    assert target_cols >= cols
    grid = None
    while True:
        key, sub = jax.random.split(key)
        if grid is None:
            toks = generate_tokens(params, text_tokens, cfg, sub, temperature=temperature, top_k=top_k)
        else:
            # teacher-force the first `overlap` columns of this window
            # with the previous window's last columns so the freshly
            # sampled columns are conditioned on the shared strip
            # (`ru_dalle/generate.py:124-172` oversampled decode)
            import jax.numpy as jnp

            forced = np.zeros((grid.shape[0], rows * cols), np.int32)
            mask = np.zeros((rows * cols,), bool)
            shared = grid[:, :, -overlap:]  # (B, rows, overlap)
            for r in range(rows):
                for c in range(overlap):
                    idx = r * cols + c
                    forced[:, idx] = shared[:, r, c]
                    mask[idx] = True
            toks = generate_tokens(params, text_tokens, cfg, sub, temperature=temperature,
                                   top_k=top_k, forced_tokens=jnp.asarray(forced),
                                   forced_mask=jnp.asarray(mask))
        window = np.asarray(toks).reshape(-1, rows, cols)
        if grid is None:
            grid = window
        else:
            grid = np.concatenate([grid, window[:, :, overlap:]], axis=2)
        if grid.shape[2] >= target_cols:
            grid = grid[:, :, :target_cols]
            break
    if decode_fn is not None:
        return decode_fn(grid)
    return grid
