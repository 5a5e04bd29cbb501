"""Autoregressive generation CLI (`maua/cli/autoregressive.py` surface)."""

from __future__ import annotations

import argparse


def main(args=None):
    parser = argparse.ArgumentParser(description="autoregressive text-to-image generation")
    parser.add_argument("--text", required=True, type=str)
    parser.add_argument("--n_candidates", default=4, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--top_k", default=64, type=int)
    parser.add_argument("--temperature", default=1.0, type=float)
    parser.add_argument("--out_dir", default="output/", type=str)
    args = parser.parse_args(args)

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.io import tensor2img
    from .transformer import ARConfig, generate_tokens, init_params

    cfg = ARConfig(width=128, layers=2, heads=4, image_rows=8, image_cols=8, text_length=16)
    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    text_tokens = jnp.asarray(
        np.array([[hash(w) % cfg.text_vocab_size for w in args.text.split()[: cfg.text_length]]
                  + [0] * max(cfg.text_length - len(args.text.split()), 0)][:1])[:, : cfg.text_length],
        jnp.int32,
    )
    toks = generate_tokens(params, jnp.tile(text_tokens, (args.n_candidates, 1)), cfg,
                           jax.random.PRNGKey(args.seed), temperature=args.temperature, top_k=args.top_k)
    # without a trained VQ decoder, visualize token grids directly
    grids = np.asarray(toks).reshape(args.n_candidates, cfg.image_rows, cfg.image_cols)
    os.makedirs(args.out_dir, exist_ok=True)
    for i, g in enumerate(grids):
        img = (g / cfg.vocab_size)[..., None].repeat(3, -1).astype(np.float32)
        tensor2img(img[None]).resize((256, 256)).save(f"{args.out_dir}/ar_{i}.png")
    print(args.out_dir)
