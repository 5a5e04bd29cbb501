"""Video super-resolution and framerate interpolation drivers.

Rebuild of `maua/super/video/` (frame-by-frame upscaling
`frame_by_frame.py:22-34`, RIFE framerate driver
`framerate/__init__.py`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..ops.video import VideoWriter, ffmpeg_available, pipelined_frames, read_video
from .image import Upscaler
from . import rife


def upscale_video(
    video_file: str,
    output_file: Optional[str] = None,
    model_name: str = "RealESRGAN-x4plus",
    batch_size: int = 4,
    max_frames: Optional[int] = None,
) -> str:
    """(`super/video/frame_by_frame.py:22-34`)"""
    frames, fps = read_video(video_file, max_frames=max_frames)
    model = Upscaler(model_name)
    t, h, w, _ = frames.shape
    wo, ho = w * model.scale, h * model.scale
    # pre-convert to the encoder's colorspace on device: halves the
    # device->host bytes of the (upscaled, so 16-48x larger) frames
    yuv = ffmpeg_available() and ho % 2 == 0 and wo % 2 == 0
    out_file = output_file or str(Path(video_file).with_suffix("")) + f"_{model_name}.mp4"
    with VideoWriter(out_file, (wo, ho), fps, value_range=(0, 1),
                     pix_fmt="yuv420p" if yuv else "rgb24") as writer:
        def batches():
            for i in range(0, t, batch_size):
                up = model(frames[i : i + batch_size])  # async dispatch
                if yuv:
                    up = jnp.clip(jnp.round(up * 255.0), 0, 255).astype(jnp.uint8)
                yield up

        for f in pipelined_frames(batches(), "yuv420p" if yuv else "rgb24"):
            writer.write(f)
    return out_file


def interpolate_video(
    video_file: str,
    output_file: Optional[str] = None,
    factor: int = 2,
    max_frames: Optional[int] = None,
    params=None,
    cfg: rife.RIFEConfig = rife.RIFEConfig(),
) -> str:
    """RIFE 2^n framerate boost (`super/video/framerate/__init__.py`)."""
    frames, fps = read_video(video_file, max_frames=max_frames)
    t, h, w, _ = frames.shape
    yuv = ffmpeg_available() and h % 2 == 0 and w % 2 == 0
    pix_fmt = "yuv420p" if yuv else "rgb24"
    out_file = output_file or str(Path(video_file).with_suffix("")) + f"_{factor}x.mp4"
    with VideoWriter(out_file, (w, h), fps * factor, value_range=(0, 1), pix_fmt=pix_fmt) as writer:
        for frame in rife.interpolate(frames, factor=factor, params=params, cfg=cfg, pix_fmt=pix_fmt):
            writer.write(frame)
    return out_file


def main(args=None):
    """CLI (reference `maua/super/video` drivers)."""
    import argparse

    parser = argparse.ArgumentParser(description="video super-resolution / frame interpolation")
    parser.add_argument("video_file", type=str)
    parser.add_argument("--mode", default="upscale", choices=["upscale", "interpolate"])
    parser.add_argument("--model_name", default="RealESRGAN-x4plus", type=str)
    parser.add_argument("--factor", default=2, type=int, help="framerate multiplier (interpolate mode)")
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--output_file", default=None, type=str)
    args = parser.parse_args(args)

    if args.mode == "upscale":
        out = upscale_video(args.video_file, output_file=args.output_file,
                            model_name=args.model_name, batch_size=args.batch_size,
                            max_frames=args.max_frames)
    else:
        out = interpolate_video(args.video_file, output_file=args.output_file,
                                factor=args.factor, max_frames=args.max_frames)
    print(out)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
