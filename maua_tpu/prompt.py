"""Typed prompt containers passed into diffusion / guidance.

Rebuild of `maua/prompt.py` (TextPrompt :12-19, ImagePrompt :22-50,
StylePrompt/ContentPrompt :53-58). Images normalize to NHWC [-1, 1].
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .ops.io import load_image
from .utility import fetch, parse_prompt


class Prompt:
    def __init__(self, content=None, weight: float = 1.0):
        self.content = content
        self.weight = float(weight)


class TextPrompt(Prompt):
    """(`maua/prompt.py:12-19`)"""

    def __init__(self, text: str, weight: float = 1.0):
        if ":" in text:
            text, weight = parse_prompt(text)
        super().__init__(text, weight)

    @property
    def text(self):
        return self.content


class ImagePrompt(Prompt):
    """(`maua/prompt.py:22-50`): loads path/url/PIL/array into a
    (1, H, W, C) float32 buffer in [-1, 1]."""

    def __init__(self, img=None, path: Optional[str] = None, url: Optional[str] = None,
                 size: Optional[Tuple[int, int]] = None, weight: float = 1.0):
        if url is not None:
            if ":" in url.replace("://", ""):
                url, weight = parse_prompt(url)
            from PIL import Image

            img = Image.open(fetch(url)).convert("RGB")
        if path is not None:
            if ":" in path:
                path, weight = parse_prompt(path)
            img = path
        arr = load_image(img)  # (1, H, W, C) in [0, 1]
        arr = arr * 2.0 - 1.0
        if size is not None:
            import jax

            arr = np.asarray(jax.image.resize(arr, (1, size[0], size[1], arr.shape[-1]), "lanczos3", antialias=True))
        super().__init__(arr.astype(np.float32), weight)

    @property
    def img(self):
        return self.content


class StylePrompt(ImagePrompt):
    """(`maua/prompt.py:53-54`)"""


class ContentPrompt(ImagePrompt):
    """(`maua/prompt.py:57-58`)"""
