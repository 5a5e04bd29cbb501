"""Perceptors: feature extractors driving style transfer and guidance.

Rebuild of `maua/perceptors/__init__.py:9-101` (hook-based Perceptor
with content/style layers and dual embed/loss modes) — hooks become
explicit feature lists returned by functional extractors.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from ..loss import feature_loss, gram_matrix, scaled_mse_loss


class Perceptor:
    """(`maua/perceptors/__init__.py:19-90`)"""

    image_size: int = 224

    def __init__(self, content_layers: Optional[Sequence[int]] = None, style_layers: Optional[Sequence[int]] = None,
                 content_strength: float = 1.0, style_strength: float = 1.0):
        self.content_layers = list(content_layers or [])
        self.style_layers = list(style_layers or [])
        self.content_strength = content_strength
        self.style_strength = style_strength

    def get_features(self, img) -> List:
        raise NotImplementedError

    def get_target_embeddings(self, img, content_weight: float = 1.0, style_weight: float = 1.0):
        feats = self.get_features(img)
        content = [feats[i] for i in self.content_layers]
        style = [gram_matrix(feats[i]) for i in self.style_layers]
        return content, style

    def get_loss(self, img, targets) -> jnp.ndarray:
        content_t, style_t = targets
        feats = self.get_features(img)
        loss = 0.0
        for i, t in zip(self.content_layers, content_t):
            loss = loss + self.content_strength * feature_loss(feats[i], t)
        for i, t in zip(self.style_layers, style_t):
            loss = loss + self.style_strength * scaled_mse_loss(gram_matrix(feats[i]), t)
        return loss


def load_perceptor(name: str):
    """Resolve a perceptor class by name
    (`maua/perceptors/__init__.py:93-101`)."""
    name = name.lower()
    if name.startswith("clip"):
        from .clip import CLIPPerceptor

        return CLIPPerceptor
    if name.startswith("pgg") or name in ("nin", "sod", "fcn32s", "nyud", "prune", "pruned"):
        from functools import partial

        from .pgg import PGGPerceptor

        model = name[4:] if name.startswith("pgg-") else (name if name != "pgg" else "vgg19")
        return partial(PGGPerceptor, model_name=model)
    if name.startswith("lpips"):
        from .lpips import LPIPSPerceptor

        return LPIPSPerceptor
    if "vgg" in name or name.split("-")[0] == "kbc":
        from functools import partial

        from .vgg import VGGPerceptor

        return partial(VGGPerceptor, arch="vgg16" if "16" in name else "vgg19")
    raise ValueError(f"unknown perceptor {name}")
