"""Flow-warped video diffusion pipeline.

Rebuild of `maua/diffusion/video.py` (VideoFlowDiffusionProcessor
:164-301, FramesOnDisk cache :83-122, async WriteThread :53-80,
video_sample :304-379): per frame, warp the previous stylized output
by optical flow, blend by the consistency mask, match histograms,
inject noise, partially denoise, write asynchronously. Full reference
control surface: first_skip / first_frame_init, turbo frame
interpolation, wrap_around loop closure, flow_exaggeration, pre/post
hooks (match_hist, sharpness), hist_persist, preview.

Flow-index convention: this package's `preprocess_optical_flow`
returns arrays indexed by TRANSITION i -> i+1 (circular), where
`backward[i]` is the pull-map that warps frame i into frame i+1
(verified empirically — see tests/test_flow.py). The reference indexes
its flow cache by destination frame (`cache.flow[f]` warps f-1 into
f), so reference index f == our index (f - 1) % N throughout.
"""

from __future__ import annotations

import os
import queue
import threading
from functools import partial, reduce
from pathlib import Path
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..flow.lib import flow_warp_map, preprocess_optical_flow
from ..flow.models import get_flow_model
from ..ops.image import match_histogram, sharpen
from ..ops.warp import grid_sample
from ..prompt import ContentPrompt, ImagePrompt, StylePrompt, TextPrompt
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

    def insert(self, frame, idx: Optional[int] = None):
        """Write/overwrite position idx (append when idx is None or
        one-past-the-end) — the reference store's insert semantics."""
        if idx is None or idx == len(self._frames):
            return self.append(frame)
        arr = np.asarray(frame)
        self._frames[idx] = arr
        self._q.put((idx, arr))

    def __getitem__(self, i):
        return self._frames[i % len(self._frames)]

    def __len__(self):
        return len(self._frames)

    def close(self):
        self._q.put(None)
        self._thread.join()


class VideoFlowDiffusionProcessor:
    """(`diffusion/video.py:164-301`)"""

    def __call__(
        self,
        diffusion: BaseDiffusionProcessor,
        video_file: str,
        init_type: str = "content",
        text: Optional[str] = None,
        image: Optional[str] = None,
        style: Optional[str] = None,
        size=(256, 256),
        t_start: Optional[float] = None,  # historical alias for `skip`
        skip: float = 0.7,
        first_skip: float = 0.4,
        first_frame_init: Optional[str] = None,
        t_end: float = 1.0,
        blend: float = 2.0,
        consistency_trust: float = 0.75,
        wrap_around: int = 0,
        turbo: int = 1,
        noise_injection: float = 0.02,
        flow_exaggeration: float = 1.0,
        loop_fade: float = 0.0,
        pre_hook: Optional[Callable] = None,
        post_hook: Optional[Callable] = None,
        hist_persist: bool = False,
        constant_seed: Optional[int] = None,
        max_frames: Optional[int] = None,
        flow_models=("farneback",),
        preview: bool = False,
        verbose: bool = True,
        key=None,
    ) -> np.ndarray:
        key = key if key is not None else jax.random.PRNGKey(0)
        if t_start is not None:
            skip = t_start
        flow_model = get_flow_model(flow_models)
        frames, _forward, backward, reliable = preprocess_optical_flow(
            video_file, flow_model, max_frames=max_frames
        )
        n_frames = len(frames)
        h, w = size
        turbo = max(1, int(turbo))
        wrap_around = int(wrap_around)

        def fit(x):
            return jax.image.resize(jnp.asarray(x), (1, h, w, x.shape[-1]), "bilinear")

        def content_at(f):
            return fit(frames[f % n_frames][None]) * 2.0 - 1.0  # [-1, 1]

        def warp_map_at(f):
            # pull-map warping frame f-1 into frame f (see module
            # docstring for the index convention), resized + scaled to
            # the synthesis resolution, with --flow-exaggeration
            fl = backward[(f - 1) % n_frames]
            scale = jnp.asarray([w / fl.shape[1], h / fl.shape[0]])
            return flow_warp_map(fit(fl[None])[0] * scale * flow_exaggeration)

        def consistency_at(f):
            m = fit(np.asarray(reliable[(f - 1) % n_frames])[None, :, :, None])
            return jnp.clip(m, 0, 1)

        out_store = FramesOnDisk(f"{WORKSPACE}/{Path(video_file).stem}_diffused")
        cache = [None] * n_frames

        hist_img = None
        if first_frame_init is not None:
            # ImagePrompt.img is already [-1, 1] (prompt.py:52-53)
            out_img = jnp.asarray(ImagePrompt(path=first_frame_init, size=(h, w)).img)
            cache[0] = out_img
            hist_img = out_img
        else:
            out_img = None

        # sqrt fade curve for the wrap-around pass (`video.py:212`)
        fade = np.sqrt(np.linspace(1, 0, wrap_around)) if wrap_around > 0 else None
        turbo_blend = np.linspace(0, 1, turbo + 1)[1:]
        turbo_prev = turbo_next = None

        for f_n in range(0, n_frames + wrap_around + turbo, turbo):
            if f_n >= n_frames + wrap_around:
                if cache[f_n % n_frames] is None:
                    break  # no wrapped frame to close the loop onto
                turbo_next = cache[f_n % n_frames]

            if f_n > 0:
                # fill the turbo - 1 in-between frames by warping the
                # last two diffused keyframes along the flow and
                # cross-fading (`video.py:225-240`)
                for t, f_t in enumerate(range(f_n - turbo, f_n)):
                    wm = warp_map_at(f_t)
                    if turbo_prev is not None:
                        turbo_prev = grid_sample(turbo_prev, wm, padding_mode="border")
                    if t != 0 and f_n < n_frames + wrap_around:
                        turbo_next = grid_sample(turbo_next, wm, padding_mode="border")
                    img = (
                        turbo_prev * (1.0 - turbo_blend[t]) + turbo_next * turbo_blend[t]
                        if turbo_prev is not None
                        else turbo_next
                    )
                    if 0 <= f_t < n_frames + wrap_around or cache[f_t % n_frames] is not None:
                        cache[f_t % n_frames] = img
                out_img = turbo_next

            if f_n >= n_frames + wrap_around:
                break  # loop-closure fill only; nothing more to diffuse

            content = content_at(f_n)
            init_img = content
            if out_img is None and init_type == "random":
                init_img = jax.random.normal(key, content.shape)

            if blend > 0:
                mask = (
                    consistency_at(f_n) * consistency_trust + (1 - consistency_trust)
                    if consistency_trust > 0
                    else jnp.ones_like(init_img)
                )
                mask = mask * blend
                prev_img = content_at(f_n - 1) if f_n == 0 else out_img
                prev_warp = grid_sample(prev_img, warp_map_at(f_n), padding_mode="border")
                init_img = (init_img + mask * prev_warp) / (1 + mask)

            if f_n >= n_frames and fade is not None:
                a = fade[f_n % n_frames] if f_n % n_frames < len(fade) else 0.0
                init_img = a * init_img + (1 - a) * jnp.asarray(cache[f_n % n_frames])

            # legacy in-pass loop fade (kept for API compatibility):
            # blend toward the first output over the last fraction
            if loop_fade > 0 and cache[0] is not None and f_n > (1 - loop_fade) * n_frames:
                alpha = (f_n - (1 - loop_fade) * n_frames) / (loop_fade * n_frames)
                init_img = (1 - alpha) * init_img + alpha * jnp.asarray(cache[0])

            if pre_hook is not None:
                init_img = pre_hook(init_img)

            if hist_persist and f_n > 0 and hist_img is not None:
                init_img = match_histogram(init_img, hist_img)

            if noise_injection > 0:
                key, sub = jax.random.split(key)
                init_img = init_img + noise_injection * jax.random.normal(sub, init_img.shape)

            prompts = [ContentPrompt(img=np.asarray((content + 1) / 2))]
            if style is not None:
                prompts.append(StylePrompt(path=style, size=size))
            if text is not None:
                prompts.append(TextPrompt(text))
            if image is not None:
                prompts.append(ImagePrompt(path=image))

            frame_key = (
                jax.random.PRNGKey(constant_seed)
                if constant_seed is not None
                else jax.random.fold_in(key, f_n)
            )
            out_img = diffusion(
                init_img, prompts, first_skip if f_n == 0 else skip, t_end,
                verbose=False, key=frame_key,
            )

            if hist_persist and f_n == 0:
                hist_img = out_img

            if post_hook is not None:
                out_img = post_hook(out_img)

            if preview:
                # headless preview: drop a PNG next to the frame store
                from ..ops.io import save_image

                ppath = f"{WORKSPACE}/{Path(video_file).stem}_preview.png"
                save_image(np.asarray((out_img[0] + 1) / 2), ppath)
                print(f"preview -> {ppath}")

            cache[f_n % n_frames] = out_img
            turbo_prev = turbo_next
            turbo_next = out_img
            if verbose:
                print(f"frame {f_n + 1}/{n_frames + wrap_around}")

        outs = [np.asarray(jnp.asarray(c)[0]) for c in cache if c is not None]
        for o in outs:
            out_store.append(o)
        out_store.close()
        return np.stack(outs)


def video_sample(
    diffusion,
    video_file: str,
    out_file: Optional[str] = None,
    fps: float = 24,
    match_hist: bool = False,
    sharpness: float = 1.0,
    style: Optional[str] = None,
    **kwargs,
) -> str:
    """(`diffusion/video.py:304-379`) — assembles the pre_hook
    (histogram match to the style image) and post_hook (sharpen) the
    reference builds from --match-hist / --sharpness."""
    from ..ops.video import write_video

    pre_hook = None
    if match_hist and style is not None:
        style_img = jnp.asarray(StylePrompt(path=style).img)  # already [-1, 1]
        pre_hook = lambda img: match_histogram(img, style_img)

    post_fns = []
    if sharpness != 1.0:
        post_fns.append(partial(sharpen, strength=sharpness))
    post_hook = (lambda img: reduce(lambda i, f: f(i), post_fns, img)) if post_fns else None

    video = VideoFlowDiffusionProcessor()(
        diffusion, video_file, style=style, pre_hook=pre_hook, post_hook=post_hook, **kwargs
    )
    out_file = out_file or f"output/{Path(video_file).stem}_diffused.mp4"
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    write_video(video, out_file, fps=fps)
    return out_file


def main(args=None):
    """CLI (reference `maua/diffusion/video.py:382-416` flag surface)."""
    import argparse

    from .image import get_diffusion_model

    # fmt: off
    parser = argparse.ArgumentParser(description="flow-warped diffusion video stylization")
    parser.add_argument("--video_file", "--init", required=True, type=str, dest="video_file")
    parser.add_argument("--text", default=None, type=str)
    parser.add_argument("--image", default=None, type=str)
    parser.add_argument("--style", default=None, type=str)
    parser.add_argument("--init_type", default="content", choices=["content", "random"])
    parser.add_argument("--diffusion", default="stable", type=str)
    parser.add_argument("--timesteps", default=25, type=int)
    parser.add_argument("--sampler", default="lms", type=str)
    parser.add_argument("--size", default="256,256", type=str)
    parser.add_argument("--skip", "--t_start", default=0.7, type=float, dest="skip",
                        help="fraction of the diffusion schedule to skip per frame (higher = closer to input)")
    parser.add_argument("--first_skip", default=0.4, type=float,
                        help="separate skip fraction for the first frame")
    parser.add_argument("--first_frame_init", default=None, type=str,
                        help="image file to initialize the first frame with")
    parser.add_argument("--blend", default=2.0, type=float)
    parser.add_argument("--consistency_trust", default=0.75, type=float)
    parser.add_argument("--wrap_around", default=0, type=int,
                        help="extra frames looping back to the start for a seamless loop")
    parser.add_argument("--turbo", default=1, type=int,
                        help="diffuse every turbo'th frame, flow-interpolate the rest")
    parser.add_argument("--noise_injection", default=0.02, type=float)
    parser.add_argument("--flow_exaggeration", default=1.0, type=float)
    parser.add_argument("--guidance_speed", default="fast", choices=["regular", "fast"])
    parser.add_argument("--clip_scale", default=0.0, type=float)
    parser.add_argument("--lpips_scale", default=0.0, type=float)
    parser.add_argument("--style_scale", default=0.0, type=float)
    parser.add_argument("--color_match_scale", default=0.0, type=float)
    parser.add_argument("--cfg_scale", default=7.5, type=float)
    parser.add_argument("--match_hist", action="store_true",
                        help="histogram-match the init to the --style image before diffusion")
    parser.add_argument("--hist_persist", action="store_true",
                        help="histogram-match subsequent frames to the first diffused frame")
    parser.add_argument("--sharpness", default=1.0, type=float)
    parser.add_argument("--loop_fade", default=0.0, type=float)
    parser.add_argument("--constant_seed", default=None, type=int)
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--preview", action="store_true")
    parser.add_argument("--fps", default=24, type=float)
    parser.add_argument("--out_file", "--out-dir", default=None, type=str, dest="out_file")
    args = parser.parse_args(args)
    # fmt: on

    diffusion = get_diffusion_model(
        args.diffusion, timesteps=args.timesteps, sampler=args.sampler,
        guidance_speed=args.guidance_speed, clip_scale=args.clip_scale,
        lpips_scale=args.lpips_scale, style_scale=args.style_scale,
        color_match_scale=args.color_match_scale, cfg_scale=args.cfg_scale,
        image=args.image,
    )
    out = video_sample(
        diffusion, args.video_file, out_file=args.out_file, fps=args.fps,
        init_type=args.init_type, text=args.text, image=args.image, style=args.style,
        size=tuple(int(s) for s in args.size.split(",")), skip=args.skip,
        first_skip=args.first_skip, first_frame_init=args.first_frame_init,
        blend=args.blend, consistency_trust=args.consistency_trust,
        wrap_around=args.wrap_around, turbo=args.turbo,
        noise_injection=args.noise_injection, flow_exaggeration=args.flow_exaggeration,
        match_hist=args.match_hist, hist_persist=args.hist_persist,
        sharpness=args.sharpness, loop_fade=args.loop_fade,
        constant_seed=args.constant_seed, max_frames=args.max_frames,
        preview=args.preview,
    )
    print(out)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
