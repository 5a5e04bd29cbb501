"""Diffusion processor interface.

Rebuild of `maua/diffusion/processors/base.py:4-9`: every diffusion
model is a partial-denoise transformer over [-1, 1] images with
signature forward(img, prompts, t_start, t_end=1).
"""

from __future__ import annotations


class BaseDiffusionProcessor:
    image_size: int = 512

    def forward(self, img, prompts, t_start, t_end=1.0, verbose=True):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)
