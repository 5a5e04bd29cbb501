"""Direct multi-pass diffusion video loop.

Rebuild of `maua/diffusion/experimental/loop_direct.py` (163 LoC): the
second half of the experimental loop pair (the circular-noise
formulation lives in `diffusion/loop.py`). Instead of a single
flow-warped pass, the whole video is partially denoised in several
passes of `blend_every` steps each; between passes the per-frame inits
are blended with the flow-warped previous output (weighted by the
consistency mask), the pass direction alternates (forward/backward
flow weighting), and each pass starts at a random frame (the
reference's `np.roll(frame_range, randint)`), so consistency errors
don't accumulate at a fixed seam. `turbo` diffuses every turbo'th
frame and pure-warps the rest.

TPU-native formulation: the warp+blend init preparation is one jitted
function reused across frames/passes (static shapes, one compile), the
diffusion processor is the standard partial-denoise surface
(`processors/base.py` forward(img, prompts, t_start, t_end)) so every
pass maps onto the same compiled sampler scan, and frames persist
through the FramesOnDisk async writer rather than torch memmaps.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..flow.lib import flow_warp_map, get_consistency_map, preprocess_optical_flow
from ..flow.models import get_flow_model
from ..ops.warp import grid_sample
from ..prompt import ContentPrompt, StylePrompt, TextPrompt
from ..utility import WORKSPACE
from .processors.base import BaseDiffusionProcessor


@partial(jax.jit, static_argnames=())
def _warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp img (1,H,W,C) by pixel flow (H,W,2)."""
    return grid_sample(img, flow_warp_map(flow), padding_mode="border")


@jax.jit
def _blend_init(init_img, prev_img, flow, reliable, consistency_trust, blend):
    """The reference's init blending (`loop_direct.py:133-144`):
    init += mask * warp(prev); init /= 1 + mask, with
    mask = (reliable * trust + (1 - trust)) * blend."""
    mask = reliable[None, :, :, None] * consistency_trust + (1.0 - consistency_trust)
    mask = mask * blend
    warped = _warp(prev_img, flow)
    return (init_img + mask * warped) / (1.0 + mask)


def loop_direct_sample(
    diffusion: BaseDiffusionProcessor,
    video_file: str,
    text: Optional[str] = None,
    style_img: Optional[str] = None,
    size=(256, 256),
    timesteps: int = 100,
    skip: float = 0.4,
    blend_every: Optional[float] = None,
    blend: float = 2.0,
    consistency_trust: float = 0.75,
    turbo: int = 1,
    flow_models=("farneback",),
    max_frames: Optional[int] = None,
    write_intermediate: bool = False,
    fps: float = 12,
    out_file: Optional[str] = None,
    verbose: bool = True,
    key=None,
) -> np.ndarray:
    """Multi-pass flow-consistent video diffusion. Returns
    (N, H, W, 3) frames in [-1, 1] (and writes `out_file` when set).

    `blend_every` < 1 is a fraction of `timesteps`; >= 1 is a step
    count; None runs ONE pass over the full `n_steps` schedule
    (the reference's default resolution, `loop_direct.py:44-49`)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    h, w = size
    turbo = max(1, int(turbo))

    n_steps = round((1.0 - skip) * timesteps)
    if blend_every is None:
        blend_every = n_steps
    elif blend_every < 1:
        blend_every = max(1, round(blend_every * timesteps))
    else:
        blend_every = int(blend_every)

    flow_model = get_flow_model(flow_models)
    frames, forward, backward, reliable_fwd = preprocess_optical_flow(
        video_file, flow_model, max_frames=max_frames
    )
    n = len(frames)
    # reliability of the BACKWARD transitions (occlusions differ per
    # direction; the forward mask is cached by preprocess_optical_flow)
    reliable_bwd = np.stack(
        [np.asarray(get_consistency_map(b, f)) for f, b in zip(forward, backward)]
    ).astype(np.float32)

    def fit(x, ch):
        return np.asarray(
            jax.image.resize(jnp.asarray(np.asarray(x)), (h, w, ch), "bilinear")
        )

    def fit_flow(fl):
        scale = np.asarray([w / fl.shape[1], h / fl.shape[0]], np.float32)
        return jnp.asarray(fit(fl, 2) * scale)

    content = [jnp.asarray(fit(f, 3))[None] * 2.0 - 1.0 for f in frames]  # [-1, 1]
    old = list(content)

    style_prompt = StylePrompt(path=style_img, size=(h, w)) if style_img else None

    direction = 1
    for pass_i, step in enumerate(range(0, n_steps, blend_every)):
        steps_this = min(blend_every, n_steps - step)
        # t indexes the descending-noise schedule (t=0 full noise):
        # this pass denoises levels [n_steps-step, n_steps-step-steps_this)
        t_start = 1.0 - (n_steps - step) / timesteps
        t_end = min(1.0, 1.0 - (n_steps - step - steps_this) / timesteps)

        key, k_roll = jax.random.split(key)
        frame_range = np.arange(n) if direction > 0 else np.flip(np.arange(n))
        frame_range = np.roll(frame_range, int(jax.random.randint(k_roll, (), 1, max(n, 2))))

        new = [None] * n
        out_img = None
        for f_i, f_n in enumerate(frame_range):
            f_n = int(f_n)
            # transition flow INTO frame f_n for this direction:
            # forward[i] maps i -> i+1, so arriving at f_n forward means
            # transition index (f_n - 1) % n; backward[i] maps i+1 -> i,
            # so arriving at f_n backward means transition index f_n.
            if direction == 1:
                flow = fit_flow(forward[(f_n - 1) % n])
                rel = jnp.asarray(fit(reliable_fwd[(f_n - 1) % n][..., None], 1)[..., 0])
            else:
                flow = fit_flow(backward[f_n % n])
                rel = jnp.asarray(fit(reliable_bwd[f_n % n][..., None], 1)[..., 0])

            if f_i % turbo != 0 and out_img is not None:
                out_img = _warp(out_img, flow)
                new[f_n] = out_img
                continue

            init_img = old[f_n]
            if blend > 0:
                prev_img = old[(f_n - direction) % n] if f_i == 0 else out_img
                init_img = _blend_init(
                    init_img, prev_img, flow, jnp.clip(rel, 0, 1),
                    jnp.float32(consistency_trust), jnp.float32(blend),
                )

            prompts = [ContentPrompt(img=np.asarray((content[f_n] + 1) / 2))]
            if text is not None:
                prompts.append(TextPrompt(text))
            if style_prompt is not None:
                prompts.append(style_prompt)

            key, k_frame = jax.random.split(key)
            out_img = diffusion(init_img, prompts, t_start, t_end, verbose=False, key=k_frame)
            new[f_n] = out_img

        old = new
        direction = -direction  # reverse flow weighting next pass
        if verbose:
            print(f"loop_direct pass {pass_i + 1}: steps {step + 1}-{step + steps_this} of {n_steps}")
        if write_intermediate:
            _write(old, video_file, fps, suffix=f"_{step + steps_this}")

    video = np.concatenate([np.asarray(f) for f in old])
    if out_file:
        from ..ops.video import write_video

        write_video(video * 0.5 + 0.5, out_file, fps=fps)
    return video


def _write(frames, video_file, fps, suffix=""):
    from ..ops.video import write_video

    stem = Path(video_file).stem
    write_video(
        np.concatenate([np.asarray(f) for f in frames]) * 0.5 + 0.5,
        f"{WORKSPACE}/{stem}_loop_direct{suffix}.mp4", fps=fps,
    )


def main(args=None):
    """CLI mirroring the reference script's knobs
    (`loop_direct.py:20-41` hardcodes them; here they're flags)."""
    import argparse

    from .image import get_diffusion_model

    parser = argparse.ArgumentParser(description="direct multi-pass diffusion video loop")
    parser.add_argument("--init", required=True, type=str, help="input video")
    parser.add_argument("--text", default=None, type=str)
    parser.add_argument("--style", default=None, type=str)
    parser.add_argument("--size", default="256,256", type=str)
    parser.add_argument("--diffusion", default="stable", type=str)
    parser.add_argument("--sampler", default="ddim", type=str)
    parser.add_argument("--timesteps", default=100, type=int)
    parser.add_argument("--skip", default=0.4, type=float)
    parser.add_argument("--blend_every", default=None, type=float,
                        help="steps per pass (<1: fraction of timesteps; default: one pass)")
    parser.add_argument("--blend", default=2.0, type=float)
    parser.add_argument("--consistency_trust", default=0.75, type=float)
    parser.add_argument("--turbo", default=1, type=int)
    parser.add_argument("--cfg_scale", default=3.0, type=float)
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--fps", default=12, type=float)
    parser.add_argument("--write_intermediate", action="store_true")
    parser.add_argument("--out_file", default=None, type=str)
    args = parser.parse_args(args)

    diffusion = get_diffusion_model(
        args.diffusion, timesteps=args.timesteps, sampler=args.sampler,
        cfg_scale=args.cfg_scale,
    )
    out_file = args.out_file or f"output/{Path(args.init).stem}_loop_direct.mp4"
    loop_direct_sample(
        diffusion, args.init, text=args.text, style_img=args.style,
        size=tuple(int(s) for s in args.size.split(",")),
        timesteps=args.timesteps, skip=args.skip, blend_every=args.blend_every,
        blend=args.blend, consistency_trust=args.consistency_trust,
        turbo=args.turbo, max_frames=args.max_frames,
        write_intermediate=args.write_intermediate, fps=args.fps, out_file=out_file,
    )
    print(out_file)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
