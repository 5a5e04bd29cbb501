"""Host-side image IO: PIL <-> NHWC float arrays.

Rebuild of `maua/ops/io.py:13-102`. Canonical tensor format is NHWC
float32; `save_image` expects [-1, 1] like the reference.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np


def _pil():
    from PIL import Image

    return Image


def img2tensor(pil_image, format: str = "RGB") -> np.ndarray:
    """PIL image -> (1, H, W, C) float32 in [0, 1]."""
    arr = np.asarray(pil_image.convert(format), dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr[None]


def tensor2img(tensor, format: str = "RGB"):
    """(1, H, W, C) or (H, W, C) in [0, 1] -> PIL image."""
    arr = np.asarray(tensor)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr, 0, 1)
    arr = np.round(arr * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    return _pil().fromarray(arr, format if arr.ndim == 3 else "L").convert(format)


def tensor2imgs(tensor, format: str = "RGB") -> List:
    return [tensor2img(img, format) for img in np.asarray(tensor)]


def tensor2bytes(tensor, value_range: Tuple[float, float] = (0, 1)) -> bytes:
    """(1,H,W,C) -> raw uint8 RGB bytes for the video pipe writer."""
    mn, mx = value_range
    arr = np.asarray(tensor)
    if arr.ndim == 4:
        arr = arr[0]
    arr = (np.clip(arr, mn, mx) - mn) / (mx - mn)
    return np.round(arr * 255).astype(np.uint8).tobytes()


def save_image(tensor, filename: str):
    """Save a [-1, 1] NHWC tensor as an image file
    (`maua/ops/io.py:13-14`)."""
    arr = (np.asarray(tensor) + 1.0) / 2.0
    tensor2img(arr).save(filename)


def load_image(im) -> np.ndarray:
    """Path/PIL/array -> (1, H, W, C) float32 in [0, 1]
    (`maua/ops/io.py:17-18`)."""
    if isinstance(im, (str, Path)):
        return img2tensor(_pil().open(im))
    if hasattr(im, "convert"):  # PIL image
        return img2tensor(im)
    arr = np.asarray(im, dtype=np.float32)
    return arr if arr.ndim == 4 else arr[None]


def load_images(*inputs):
    """Recursively load nested paths/images/arrays
    (`maua/ops/io.py:21-34`)."""
    results = []
    for item in inputs:
        if item is None:
            results.append(None)
        elif isinstance(item, (list, tuple)):
            results.append(load_images(*item))
        else:
            results.append(load_image(item))
    return results


def content_hash(obj) -> str:
    """Cheap rolling hash of array contents for cache keys
    (`maua/ops/io.py:86-102`)."""
    if isinstance(obj, (float, int, str, bool)):
        return str(obj)
    arr = np.asarray(obj)
    arr = arr - arr.min()
    mx = arr.max()
    if mx > 0:
        arr = arr / mx
    byte = (arr * 255).ravel().astype(np.uint8)
    h = 0
    for ch in byte[:1024:4]:
        h = (h * 281 ^ int(ch) * 997) & 0xFFFFFFFF
    return str(hex(h)[2:].upper().zfill(8))
