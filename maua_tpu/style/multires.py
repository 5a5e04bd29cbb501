"""Coarse-to-fine multi-resolution style transfer schedules.

Rebuild of `maua/style/image_multires.py:14` and
`maua/style/video_multires.py:12`: run transfer at increasing sizes,
feeding each scale's output as the next scale's init.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..ops.image import resample
from . import image as style_image


def transfer_multires(
    content_img,
    style_imgs,
    sizes: Sequence[int] = (256, 512),
    n_iters_per_scale: Optional[Sequence[int]] = None,
    **kwargs,
):
    """(`maua/style/image_multires.py:14`)"""
    iters = list(n_iters_per_scale or [512 // len(sizes)] * len(sizes))
    out = None
    for size, n_iters in zip(sizes, iters):
        init = None if out is None else np.asarray((resample(out, size) + 1) / 2)
        out = style_image.transfer(
            content_img, style_imgs, init_img=init,
            init_type="content" if init is None else "init_img",
            size=size, n_iters=n_iters, **kwargs,
        )
    return out
