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
    slower: int = 1,
    decimate: int = 1,
    max_frames: Optional[int] = None,
    params=None,
    cfg: rife.RIFEConfig = rife.RIFEConfig(),
) -> str:
    """RIFE 2^n framerate boost (`super/video/framerate/__init__.py`).

    Output frame rate = original_fps * factor / slower / decimate
    (`maua/cli/super.py:106-110`): `slower` keeps every frame but slows
    playback; `decimate` drops all but every d'th interpolated frame."""
    frames, fps = read_video(video_file, max_frames=max_frames)
    t, h, w, _ = frames.shape
    yuv = ffmpeg_available() and h % 2 == 0 and w % 2 == 0
    pix_fmt = "yuv420p" if yuv else "rgb24"
    out_fps = fps * factor / max(slower, 1) / max(decimate, 1)
    out_file = output_file or str(Path(video_file).with_suffix("")) + f"_{factor}x.mp4"
    with VideoWriter(out_file, (w, h), out_fps, value_range=(0, 1), pix_fmt=pix_fmt) as writer:
        for i, frame in enumerate(rife.interpolate(frames, factor=factor, params=params, cfg=cfg,
                                                   pix_fmt=pix_fmt)):
            if i % max(decimate, 1) == 0:
                writer.write(frame)
    return out_file


def main(args=None):
    """CLI (reference `maua/super/video` drivers)."""
    import argparse

    parser = argparse.ArgumentParser(
        description="video super-resolution / frame interpolation. interpolate-mode output "
                    "frame rate = original_fps * interpolation_factor / slower / decimate")
    parser.add_argument("video_files", type=str, nargs="+")
    parser.add_argument("--mode", default="upscale", choices=["upscale", "interpolate"])
    parser.add_argument("--model_name", default="RealESRGAN-x4plus", type=str)
    parser.add_argument("-if", "--interpolation_factor", "--factor", dest="factor", default=2,
                        type=int, help="framerate multiplier (interpolate mode)")
    parser.add_argument("-s", "--slower", default=1, type=int,
                        help="factor to decrease output framerate by (interpolate mode)")
    parser.add_argument("-d", "--decimate", default=1, type=int,
                        help="alternative to --slower that keeps only every d'th frame")
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--output_file", default=None, type=str,
                        help="only valid with a single input video")
    args = parser.parse_args(args)

    if args.output_file and len(args.video_files) > 1:
        raise SystemExit("--output_file requires a single input video")
    for video_file in args.video_files:
        if args.mode == "upscale":
            out = upscale_video(video_file, output_file=args.output_file,
                                model_name=args.model_name, batch_size=args.batch_size,
                                max_frames=args.max_frames)
        else:
            out = interpolate_video(video_file, output_file=args.output_file,
                                    factor=args.factor, slower=args.slower,
                                    decimate=args.decimate, max_frames=args.max_frames)
        print(out)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
