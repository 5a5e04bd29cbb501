"""Patch base classes: user-authored audio->GAN mapping recipes.

Rebuild of `maua/audiovisual/patches/base/__init__.py:7-44` (MauaPatch
+ dynamic patch loading) and `patches/base/stylegan2.py:7-53`
(StyleGAN2Patch). A patch produces pytrees of per-frame synthesizer
inputs; the renderer scans them through the jitted synthesis.
"""

from __future__ import annotations

import importlib
import importlib.util
import inspect
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ...audio.io import load_audio
from ...gan.wrappers import StyleGAN2


class MauaPatch:
    """(`patches/base/__init__.py:7-25`)"""

    def __init__(self, audio_file: str, fps: float = 24, offset: float = 0, duration: float = -1):
        self.fps = fps
        self.audio_file = audio_file
        self.audio, self.sr, self.duration = load_audio(audio_file, offset, duration)
        self.n_frames = round(self.duration * self.fps)

    def process_audio(self):
        pass

    def force_output_size(self, video):
        """Resize rendered frames to the synthesizer output size
        (`patches/base/__init__.py:18-22`). video: (T, H, W, C)."""
        import jax

        t, h, w, c = video.shape
        out_w, out_h = self.synthesizer_output_size
        if (w, h) != (out_w, out_h):
            video = jax.image.resize(video, (t, out_h, out_w, c), method="lanczos3", antialias=True)
        return video


class StyleGAN2Patch(MauaPatch):
    """(`patches/base/stylegan2.py:7-53`)"""

    def __init__(
        self,
        model_file: Optional[str],
        audio_file: str,
        fps: float = 24,
        offset: float = 0,
        duration: float = -1,
        output_size: Tuple[int, int] = (1024, 1024),
        resize_strategy: str = "stretch",
        resize_layer: int = 0,
        **stylegan_kwargs,
    ):
        super().__init__(audio_file, fps, offset, duration)
        self.stylegan2 = StyleGAN2(model_file, output_size, resize_strategy, resize_layer, **stylegan_kwargs)
        self.mapper = self.stylegan2.mapper
        self.synthesizer = self.stylegan2.synthesizer
        self.synthesizer_output_size = output_size

    def process_mapper_inputs(self):
        return {"latent_z": np.random.randn(1, self.stylegan2.z_dim).astype(np.float32)}

    def process_synthesizer_inputs(self, latent_w):
        return {"latent_w_plus": latent_w}

    def process_outputs(self, video):
        return video


class StyleGAN3Patch(MauaPatch):
    """Alias-free variant (`patches/base/stylegan3.py:5-50`): the
    synthesizer additionally takes per-frame translation/rotation that
    drive the Fourier input transform."""

    def __init__(
        self,
        model_file: Optional[str],
        audio_file: str,
        fps: float = 24,
        offset: float = 0,
        duration: float = -1,
        output_size: Tuple[int, int] = (1024, 1024),
        resize_strategy: str = "stretch",  # SG3 output resize happens in
        resize_layer: int = 0,  # process_outputs (no layer hooks in alias-free nets)
        **stylegan_kwargs,
    ):
        from ...gan.stylegan3 import SG3Config, StyleGAN3
        from ...gan.wrappers import get_z_latents as _gz

        super().__init__(audio_file, fps, offset, duration)
        if model_file is not None and model_file != "None":
            self.stylegan3 = StyleGAN3(model_file=model_file, **stylegan_kwargs)
        else:
            cfg = stylegan_kwargs.pop("cfg", None) or SG3Config(img_resolution=max(output_size))
            self.stylegan3 = StyleGAN3(cfg=cfg, **stylegan_kwargs)
        self.stylegan3.get_z_latents = lambda seeds: _gz(seeds, self.stylegan3.cfg.z_dim)
        self.mapper = self.stylegan3.mapper
        self.synthesizer = self.stylegan3.synthesizer
        self.synthesizer_output_size = output_size

    def process_mapper_inputs(self):
        return {"latent_z": np.random.randn(1, self.stylegan3.cfg.z_dim).astype(np.float32)}

    def process_synthesizer_inputs(self, latent_w):
        return {"latent_w_plus": latent_w}

    def process_outputs(self, video):
        return video


def get_patch_from_file(filepath: str, class_name: Optional[str] = None):
    """Load a MauaPatch subclass from a user .py file
    (`patches/base/__init__.py:28-44`)."""
    import sys

    name = "maua_user_patch_" + Path(filepath).stem
    spec = importlib.util.spec_from_file_location(name, filepath)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module  # let the patch file import dataclasses/pickle-safe
    spec.loader.exec_module(module)
    for _, cls in inspect.getmembers(module, inspect.isclass):
        if issubclass(cls, MauaPatch) and cls not in (MauaPatch, StyleGAN2Patch, StyleGAN3Patch):
            if class_name is None or cls.__name__ == class_name:
                return cls
    raise Exception(
        "Patch not found! Are you sure there is a class that extends MauaPatch in the file you specified "
        "and that the name you (might have) specified is correct?"
    )
