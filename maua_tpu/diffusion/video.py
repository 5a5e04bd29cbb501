"""Flow-warped video diffusion pipeline.

Rebuild of `maua/diffusion/video.py` (VideoFlowDiffusionProcessor
:165-301, FramesOnDisk cache :83-122, async WriteThread :53-80,
video_sample :304-379): per frame, warp the previous stylized output
by optical flow, blend by the consistency mask, match histograms,
inject noise, partially denoise, write asynchronously.
"""

from __future__ import annotations

import os
import queue
import threading
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..flow.lib import flow_warp_map, preprocess_optical_flow
from ..flow.models import get_flow_model
from ..ops.image import match_histogram
from ..ops.warp import grid_sample
from ..prompt import ContentPrompt, StylePrompt, TextPrompt
from ..utility import WORKSPACE
from .processors.base import BaseDiffusionProcessor


class FramesOnDisk:
    """Append-only per-frame store (`diffusion/video.py:83-122`) with a
    background writer thread."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._frames = []
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                break
            idx, arr = item
            np.save(f"{self.path}_{idx:06d}.npy", arr)

    def append(self, frame):
        arr = np.asarray(frame)
        self._frames.append(arr)
        self._q.put((len(self._frames) - 1, arr))

    def __getitem__(self, i):
        return self._frames[i % len(self._frames)]

    def __len__(self):
        return len(self._frames)

    def close(self):
        self._q.put(None)
        self._thread.join()


class VideoFlowDiffusionProcessor:
    """(`diffusion/video.py:165-301`)"""

    def __call__(
        self,
        diffusion: BaseDiffusionProcessor,
        video_file: str,
        init_type: str = "content",
        text: Optional[str] = None,
        image: Optional[str] = None,
        style: Optional[str] = None,
        size=(256, 256),
        t_start: float = 0.4,
        t_end: float = 1.0,
        blend: float = 1.0,
        consistency_trust: float = 0.75,
        noise_injection: float = 0.02,
        loop_fade: float = 0.0,
        hist_persist: bool = True,
        constant_seed: Optional[int] = None,
        max_frames: Optional[int] = None,
        flow_models=("farneback",),
        verbose: bool = True,
        key=None,
    ) -> np.ndarray:
        key = key if key is not None else jax.random.PRNGKey(0)
        flow_model = get_flow_model(flow_models)
        frames, forward, backward, reliable = preprocess_optical_flow(
            video_file, flow_model, max_frames=max_frames
        )
        n_frames = len(frames)
        h, w = size

        def fit(x):
            return jax.image.resize(jnp.asarray(x), (1, h, w, x.shape[-1]), "bilinear")

        out_store = FramesOnDisk(f"{WORKSPACE}/{Path(video_file).stem}_diffused")
        prev = None
        first_out = None
        outs = []
        for f_i in range(n_frames):
            content = fit(frames[f_i][None]) * 2.0 - 1.0  # [-1, 1]
            if prev is None:
                init_img = content if init_type == "content" else jax.random.normal(key, content.shape)
            else:
                # warp previous output into this frame: pull-sampling
                # needs flow_model(cur, prev) = backward[f_i - 1]
                # (`maua/diffusion/video.py:146` builds the same
                # cur->prev flow for its warp)
                warp_map = flow_warp_map(fit(backward[f_i - 1][None])[0] * jnp.asarray([w / backward.shape[2], h / backward.shape[1]]))
                warped = grid_sample(prev, warp_map, padding_mode="border")
                mask = fit(np.asarray(reliable[f_i - 1])[None, :, :, None])
                mask = jnp.clip(mask, 0, 1) * consistency_trust + (1 - consistency_trust)
                init_img = mask * warped + (1 - mask) * content
                init_img = blend * init_img + (1 - blend) * content

            if loop_fade > 0 and first_out is not None and f_i > (1 - loop_fade) * n_frames:
                alpha = (f_i - (1 - loop_fade) * n_frames) / (loop_fade * n_frames)
                init_img = (1 - alpha) * init_img + alpha * first_out

            if hist_persist and first_out is not None:
                init_img = match_histogram(init_img, first_out)

            if noise_injection > 0:
                key, sub = jax.random.split(key)
                init_img = init_img + noise_injection * jax.random.normal(sub, init_img.shape)

            prompts = [ContentPrompt(img=np.asarray((content + 1) / 2))]
            if text is not None:
                prompts.append(TextPrompt(text))
            if style is not None:
                prompts.append(StylePrompt(path=style, size=size))

            frame_key = jax.random.PRNGKey(constant_seed) if constant_seed is not None else jax.random.fold_in(key, f_i)
            out = diffusion(init_img, prompts, t_start, t_end, verbose=False, key=frame_key)
            prev = out
            if first_out is None:
                first_out = out
            out_store.append(out)
            outs.append(np.asarray(out[0]))
            if verbose:
                print(f"frame {f_i + 1}/{n_frames}")

        out_store.close()
        return np.stack(outs)


def video_sample(
    diffusion: BaseDiffusionProcessor,
    video_file: str,
    out_file: Optional[str] = None,
    fps: float = 24,
    **kwargs,
) -> str:
    """(`diffusion/video.py:304-379`)"""
    from ..ops.video import write_video

    video = VideoFlowDiffusionProcessor()(diffusion, video_file, **kwargs)
    out_file = out_file or f"output/{Path(video_file).stem}_diffused.mp4"
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    write_video(video, out_file, fps=fps)
    return out_file


def main(args=None):
    """CLI (reference `maua/diffusion/video.py` __main__ block)."""
    import argparse

    from .image import get_diffusion_model

    # fmt: off
    parser = argparse.ArgumentParser(description="flow-warped diffusion video stylization")
    parser.add_argument("--video_file", required=True, type=str)
    parser.add_argument("--text", default=None, type=str)
    parser.add_argument("--image", default=None, type=str)
    parser.add_argument("--style", default=None, type=str)
    parser.add_argument("--init_type", default="content", choices=["content", "random"])
    parser.add_argument("--diffusion", default="stable", type=str)
    parser.add_argument("--timesteps", default=25, type=int)
    parser.add_argument("--sampler", default="lms", type=str)
    parser.add_argument("--size", default="256,256", type=str)
    parser.add_argument("--t_start", default=0.4, type=float)
    parser.add_argument("--blend", default=1.0, type=float)
    parser.add_argument("--consistency_trust", default=0.75, type=float)
    parser.add_argument("--noise_injection", default=0.02, type=float)
    parser.add_argument("--loop_fade", default=0.0, type=float)
    parser.add_argument("--constant_seed", default=None, type=int)
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--fps", default=24, type=float)
    parser.add_argument("--out_file", default=None, type=str)
    args = parser.parse_args(args)
    # fmt: on

    diffusion = get_diffusion_model(args.diffusion, timesteps=args.timesteps, sampler=args.sampler)
    out = video_sample(
        diffusion, args.video_file, out_file=args.out_file, fps=args.fps,
        init_type=args.init_type, text=args.text, image=args.image, style=args.style,
        size=tuple(int(s) for s in args.size.split(",")), t_start=args.t_start,
        blend=args.blend, consistency_trust=args.consistency_trust,
        noise_injection=args.noise_injection, loop_fade=args.loop_fade,
        constant_seed=args.constant_seed, max_frames=args.max_frames,
    )
    print(out)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
