"""CLIP + aesthetic image ranking.

Rebuild of `maua/dataset/ranker.py:4` (ImageRanker) and the
LAION CLIP-retrieval scraper role (`dataset/laion_clip_retrieval.py`
— a network service client, stubbed offline with a clear error).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp


class ImageRanker:
    """Rank images by CLIP-prompt similarity + aesthetic score."""

    def __init__(self, perceptor=None, aesthetic_weight: float = 0.5):
        if perceptor is None:
            from ..perceptors.clip import AestheticPerceptor

            perceptor = AestheticPerceptor()
        self.perceptor = perceptor
        self.aesthetic_weight = aesthetic_weight

    def score(self, images, prompt: Optional[str] = None) -> np.ndarray:
        imgs = jnp.asarray(images)
        emb = self.perceptor.encode_image(imgs)
        total = jnp.zeros(imgs.shape[0])
        if prompt is not None:
            txt = self.perceptor.encode_text([prompt])
            total = total + (emb @ txt.T)[:, 0]
        if hasattr(self.perceptor, "score") and self.aesthetic_weight > 0:
            total = total + self.aesthetic_weight * self.perceptor.score(imgs)
        return np.asarray(total)

    def rank(self, images, prompt: Optional[str] = None) -> np.ndarray:
        return np.argsort(-self.score(images, prompt))


def laion_clip_retrieval(texts=(), images=(), urls=(), out_dir="output/",
                         min_size=None, **query_kwargs):
    """Retrieve + download LAION candidates
    (`dataset/laion_clip_retrieval.py`). The request/parse logic lives
    in `laion_clip_retrieval.retrieve`/`download` (offline-testable via
    injectable transports); the default transports need egress."""
    from .laion_clip_retrieval import download, retrieve

    candidates = retrieve(texts=texts, images=images, urls=urls, **query_kwargs)
    return download(candidates, out_dir, min_size=min_size)
