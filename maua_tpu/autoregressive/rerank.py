"""CLIP reranking of autoregressive sample candidates.

Rebuild of the minDALLE/RQ sampling + rerank path
(`maua/autoregressive/min_dalle/generate.py:14-41`,
`rq_dalle.py:51-217`).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np


def clip_rerank(images: jax.Array, text: str, top_n: int = 4, perceptor=None) -> np.ndarray:
    """Score candidate images against the prompt with CLIP and return
    the indices of the top_n."""
    if perceptor is None:
        from ..perceptors.clip import CLIPPerceptor

        perceptor = CLIPPerceptor()
    img_emb = perceptor.encode_image(jnp.asarray(images))
    txt_emb = perceptor.encode_text([text])
    sims = np.asarray(img_emb @ txt_emb.T)[:, 0]
    return np.argsort(-sims)[:top_n]


def generate_and_rerank(params, cfg, text_tokens, text: str, decode_fn, n_candidates: int = 8,
                        top_n: int = 2, key=None, perceptor=None, batch_size: int = 0,
                        **sample_kwargs) -> np.ndarray:
    """Sample n_candidates token grids, decode, CLIP-rerank, return the
    best images. `batch_size` > 0 samples candidates in fixed-size
    chunks (one compile, bounded memory — the reference's
    `rq_dalle.py --batch_size` sampling loop); the last chunk is padded
    to the same shape and the extras dropped."""
    from .transformer import generate_tokens

    key = key if key is not None else jax.random.PRNGKey(0)
    if batch_size and batch_size < n_candidates:
        imgs = []
        done = 0
        while done < n_candidates:
            key, sub = jax.random.split(key)
            batched_text = jnp.tile(jnp.asarray(text_tokens), (batch_size, 1))
            toks = generate_tokens(params, batched_text, cfg, sub, **sample_kwargs)
            take = min(batch_size, n_candidates - done)
            imgs.append(np.asarray(decode_fn(np.asarray(toks)))[:take])
            done += take
        imgs = np.concatenate(imgs)
    else:
        batched_text = jnp.tile(jnp.asarray(text_tokens), (n_candidates, 1))
        toks = generate_tokens(params, batched_text, cfg, key, **sample_kwargs)
        imgs = decode_fn(np.asarray(toks))
    best = clip_rerank(imgs, text, top_n=top_n, perceptor=perceptor)
    return np.asarray(imgs)[best]
