"""Renderers: drive the synthesizer over per-frame input pytrees and
deliver frames to an encoder or an array.

Rebuild of `maua/audiovisual/render/` (`__init__.py:9-18`
get_output_class; `ffmpeg.py:21-77` FFMPEG renderer; `memmap.py:11-34`
MemMap). The TPU design: frames are synthesized in jitted batches on
device, converted to uint8 on device, and streamed to the writer
thread — the encoder never stalls the accelerator.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np




def _split_inputs(synthesizer_inputs: Dict):
    """Separate latents / camera mods / noises from a patch's input
    dict (keys follow the reference's modulation_targets +
    make_noise_pyramid naming)."""
    latents = synthesizer_inputs.get("latent_w_plus", synthesizer_inputs.get("latent_w"))
    translation = synthesizer_inputs.get("translation")
    zoom = synthesizer_inputs.get("zoom")
    rotation = synthesizer_inputs.get("rotation")
    noises = {k: v for k, v in synthesizer_inputs.items() if k.startswith(("noise", "b")) and hasattr(v, "ndim") and v.ndim >= 3}
    return latents, translation, zoom, rotation, (noises or None)


class FFMPEG:
    """Stream frames into a threaded video writer
    (`render/ffmpeg.py:21-77`)."""

    def __init__(self, output_file: str, fps: float = 24, audio_file: Optional[str] = None,
                 batch_size: int = 32, pix_fmt: Optional[str] = None, **writer_kwargs):
        self.output_file = output_file
        self.fps = fps
        self.audio_file = audio_file
        self.batch_size = batch_size
        self.pix_fmt = pix_fmt
        self.writer_kwargs = writer_kwargs

    def __call__(self, synthesizer_render, synthesizer_inputs: Dict, postprocess: Optional[Callable] = None):
        from ..ops.video import VideoWriter, ffmpeg_available

        # the encoder output is yuv420p either way; compressing on
        # device (ops/framecodec DPCM DCT, pix_fmt="dct") cuts the
        # device->host frame bytes ~4-8x vs rgb24 at >=40 dB — the
        # default delivery path. "dct" self-degrades to plain I420 for
        # non-16-aligned sizes (ops/video.pipelined_frames); without an
        # ffmpeg binary the cv2 writer consumes the I420 frames
        # directly, so the compressed delivery path stays the default.
        pix_fmt = self.pix_fmt or "dct"
        latents, translation, zoom, rotation, noises = _split_inputs(synthesizer_inputs)

        def make_iter(fmt):
            return synthesizer_render(
                latents, noises=noises, translation=translation, zoom=zoom, rotation=rotation,
                batch_size=self.batch_size, postprocess=postprocess, pix_fmt=fmt,
            )

        frame_iter = make_iter(pix_fmt)
        try:
            first = next(frame_iter)
        except ValueError as e:
            # odd frame dimensions can't be I420; fall back to the
            # rgb24 pipe whose pad filter handles them
            if pix_fmt not in ("yuv420p", "dct") or "even frame dimensions" not in str(e):
                raise
            pix_fmt = "rgb24"
            frame_iter = make_iter(pix_fmt)
            first = next(frame_iter)
        writer_fmt = "yuv420p" if pix_fmt in ("yuv420p", "dct") else pix_fmt
        if writer_fmt == "yuv420p":
            h, w = first.shape[0] * 2 // 3, first.shape[1]
        else:
            h, w = first.shape[0], first.shape[1]
        duration = latents.shape[0] / self.fps
        with VideoWriter(
            self.output_file, (w, h), self.fps, audio_file=self.audio_file, audio_duration=duration,
            value_range=(0, 255), pix_fmt=writer_fmt, **self.writer_kwargs,
        ) as video:
            video.write(first.tobytes())
            for frame in frame_iter:
                video.write(frame.tobytes())
        return self.output_file


class MemMap:
    """Accumulate frames into one array (`render/memmap.py:11-34`)."""

    def __init__(self, batch_size: int = 8, **_):
        self.batch_size = batch_size

    def __call__(self, synthesizer_render, synthesizer_inputs: Dict, postprocess: Optional[Callable] = None):
        latents, translation, zoom, rotation, noises = _split_inputs(synthesizer_inputs)
        frames = list(
            synthesizer_render(
                latents, noises=noises, translation=translation, zoom=zoom, rotation=rotation,
                batch_size=self.batch_size, postprocess=postprocess,
            )
        )
        return np.stack(frames)


def get_output_class(renderer: str):
    """(`render/__init__.py:9-18`)"""
    if renderer == "ffmpeg":
        return FFMPEG
    if renderer == "memmap":
        return MemMap
    raise ValueError(f"unknown renderer {renderer}")
