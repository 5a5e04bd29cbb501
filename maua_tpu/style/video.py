"""Flow-consistent video style transfer (Ruder multi-pass).

Rebuild of `maua/style/video.py:25-200`: per-frame optimization in
alternating directions over multiple passes, warping the neighboring
frame's stylized output by optical flow and penalizing deviation on
flow-consistent pixels.
"""

from __future__ import annotations


from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..flow.lib import flow_warp_map, preprocess_optical_flow
from ..flow.models import get_flow_model
from ..loss import gram_matrix, scaled_mse_loss, tv_loss
from ..ops.image import match_histogram, resample
from ..ops.io import load_images
from ..ops.warp import grid_sample
from ..optimizers import load_optimizer
from ..parameterizations import load_parameterization

from ..perceptors import load_perceptor


def transfer(
    video_file: str,
    style_imgs: List,
    size: int = 256,
    n_passes: int = 4,
    n_iters: int = 64,
    temporal_weight: float = 50.0,
    content_weight: float = 1.0,
    style_weight: float = 50.0,
    tv_weight: float = 10.0,
    parameterization: str = "rgb",
    perceptor: str = "kbc-vgg19",
    perceptor_kwargs=None,
    optimizer: str = "adam",
    optimizer_kwargs=None,
    lr: float = 0.05,
    flow_models=("farneback",),
    max_frames: Optional[int] = None,
    init_type: str = "content",
    init_video=None,
    match_hist: str = "False",
    style_scale: float = 1.0,
    temporal_loss_after: int = -1,
    blend_factor: float = 1.0,
    start_random_frame: bool = False,
    save_intermediate: Optional[str] = None,
    fps: float = 24.0,
    verbose: bool = True,
    key=None,
) -> np.ndarray:
    """(`maua/style/video.py:25-200`): returns stylized frames
    (T, H, W, 3) in [-1, 1].

    Reference semantics carried over: blending of the warped previous
    frame into the init only on middle passes (`video.py:133`),
    temporal loss only after pass `temporal_loss_after` (`:134`),
    histogram matching of init and result against the styles (`:159,191`),
    optional random starting frame per pass (`:120-122`) and
    per-pass intermediate videos (`:196-197`). One jitted
    scan-optimizer is compiled once and reused for every frame/pass.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    frames, forward, backward, reliable = preprocess_optical_flow(
        video_file, get_flow_model(flow_models), max_frames=max_frames
    )
    n = len(frames)
    (styles,) = load_images(list(style_imgs))
    styles = [resample(jnp.asarray(im) * 2 - 1, int(size * style_scale)) for im in styles]

    percept = load_perceptor(perceptor)(**(perceptor_kwargs or {}))
    style_targets = None
    for s in styles:
        feats = percept.get_features(s)
        grams = [gram_matrix(feats[i]) for i in percept.style_layers]
        if style_targets is None:
            style_targets = [g / len(styles) for g in grams]
        else:
            style_targets = [t + g / len(styles) for t, g in zip(style_targets, grams)]

    contents = [resample(jnp.asarray(f[None]) * 2 - 1, size) for f in np.asarray(frames)]
    h, w = contents[0].shape[1], contents[0].shape[2]

    def fit_flow(fl):
        scale = jnp.asarray([w / fl.shape[1], h / fl.shape[0]])
        return jax.image.resize(jnp.asarray(fl), (h, w, 2), "bilinear") * scale

    def fit_mask(m):
        return jax.image.resize(jnp.asarray(m)[..., None], (h, w, 1), "bilinear")

    def hist(img):
        return match_histogram(img, styles, mode=match_hist) if match_hist not in ("False", False) else img

    # reference semantics: n_iters is the per-frame total, split evenly
    # across passes (`maua/style/video.py:167`)
    opt, niter = load_optimizer(optimizer, lr, optimizer_kwargs, max(n_iters // n_passes, 1))

    # one pastiche reused for every frame: re-encoded from each frame's
    # init, optimized in parameter space (`maua/style/video.py:99,160-174`)
    pastiche = load_parameterization(parameterization)(h, w, key=key)

    # one compilation for all frames & passes: per-frame targets are
    # arguments, the pass-dependent temporal toggle is a scalar weight
    @jax.jit
    def optimize(init_params, content_targets, temporal_target, temporal_mask, t_weight):
        def loss_fn(p):
            img = pastiche.decode(p)
            feats = percept.get_features(img)
            loss = tv_weight * tv_loss(img)
            for i, t in zip(percept.content_layers, content_targets):
                loss = loss + content_weight * scaled_mse_loss(feats[i], t)
            for i, t in zip(percept.style_layers, style_targets):
                loss = loss + style_weight * scaled_mse_loss(gram_matrix(feats[i]), t)
            loss = loss + t_weight * jnp.mean(temporal_mask * jnp.square(img - temporal_target))
            return loss

        def step(carry, _):
            p, s = carry
            _, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), None

        (p, _), _ = jax.lax.scan(step, (init_params, opt.init(init_params)), None, length=niter)
        return jnp.clip(pastiche.decode(p), -1, 1)

    def encode_init(init):
        pastiche.encode(init)
        return pastiche.params()

    def content_targets_of(content):
        feats = percept.get_features(content)
        return [feats[i] for i in percept.content_layers]

    # initial frames (`video.py:141-151`)
    if init_type == "random":
        key, sub = jax.random.split(key)
        outputs = [jax.random.uniform(k, c.shape) * 0.2 - 1.0
                   for k, c in zip(jax.random.split(sub, n), contents)]
    elif init_type == "init_video" and init_video is not None:
        if isinstance(init_video, str):
            from ..ops.video import read_video

            init_video, _ = read_video(init_video, max_frames=n)
        outputs = [resample(jnp.asarray(np.asarray(init_video)[i][None]) * 2 - 1, size) for i in range(n)]
    else:  # content / prev_warped start from content
        outputs = [c for c in contents]

    rng = np.random.RandomState(0)
    zero_t = jnp.zeros_like(contents[0])
    zero_m = jnp.zeros((1, h, w, 1), jnp.float32)
    for pass_n in range(n_passes):
        forward_dir = pass_n % 2 == 0
        order = list(range(n)) if forward_dir else list(range(n - 1, -1, -1))
        if start_random_frame:
            si = rng.randint(n)
            order = order[si:] + order[:si]
        using_blending = blend_factor > 0 and 0 < pass_n < n_passes - 1
        using_temporal = temporal_weight > 0 and pass_n > temporal_loss_after
        for f_i in order:
            prev_i = (f_i - 1) % n if forward_dir else (f_i + 1) % n
            # pull-warping prev into the current frame needs the flow
            # sampled AT the current frame pointing to prev, i.e.
            # flow_model(cur, prev): backward[prev_i] on the forward
            # pass, forward[f_i] on the backward pass (verified
            # empirically against a known-translation clip; the
            # reference's video diffusion builds exactly this flow,
            # maua/diffusion/video.py:146)
            need_warp = using_blending or using_temporal or init_type == "prev_warped"
            if need_warp:
                flow = backward[prev_i] if forward_dir else forward[f_i]
                rel = reliable[prev_i] if forward_dir else reliable[f_i]
                warp = flow_warp_map(fit_flow(flow))
                warped_prev = grid_sample(outputs[prev_i], warp, padding_mode="border")
                mask = jnp.clip(fit_mask(rel), 0, 1)
            else:
                warped_prev, mask = zero_t, zero_m

            if init_type == "prev_warped":
                init = warped_prev
            else:
                init = outputs[f_i]
            if using_blending:
                blend_mask = blend_factor * mask
                init = (init + blend_mask * warped_prev) / (1 + blend_mask)
            init = hist(init)

            t_w = jnp.asarray(temporal_weight if using_temporal else 0.0, jnp.float32)
            outputs[f_i] = hist(optimize(encode_init(init), content_targets_of(contents[f_i]), warped_prev, mask, t_w))
        if verbose:
            print(f"pass {pass_n + 1}/{n_passes} done")
        if save_intermediate:
            from ..ops.video import write_video

            write_video(np.concatenate([np.asarray(o) for o in outputs]),
                        save_intermediate, fps=fps)

    return np.concatenate([np.asarray(o) for o in outputs])


def main(args=None):
    """CLI (reference `maua/style/video.py` argparse block)."""
    import argparse
    from pathlib import Path

    from ..ops.video import write_video

    # fmt: off
    parser = argparse.ArgumentParser(description="flow-consistent video style transfer")
    parser.add_argument("--video_file", "--content", dest="video_file", required=True, type=str)
    parser.add_argument("--styles", required=True, nargs="+", type=str)
    parser.add_argument("--init_type", default="content", choices=["content", "random", "prev_warped", "init_video"])
    parser.add_argument("--init_video", default=None, type=str)
    parser.add_argument("--match_hist", default="avg", type=str)
    parser.add_argument("--size", default=256, type=int)
    parser.add_argument("--n_passes", default=4, type=int)
    parser.add_argument("--n_iters", default=64, type=int)
    parser.add_argument("--temporal_loss_after", default=-1, type=int)
    parser.add_argument("--blend_factor", default=1.0, type=float)
    parser.add_argument("--temporal_weight", default=50.0, type=float)
    parser.add_argument("--content_weight", default=1.0, type=float)
    parser.add_argument("--style_weight", default=50.0, type=float)
    parser.add_argument("--tv_weight", default=10.0, type=float)
    parser.add_argument("--parameterization", default="rgb", type=str)
    parser.add_argument("--style_scale", default=1.0, type=float)
    parser.add_argument("--perceptor", default="kbc-vgg19", type=str)
    parser.add_argument("--perceptor_kwargs", nargs="*", default=[])
    parser.add_argument("--flow_models", nargs="+", default=["farneback"])
    parser.add_argument("--optimizer", default="adam", type=str)
    parser.add_argument("--optimizer_kwargs", nargs="*", default=[])
    parser.add_argument("--lr", default=0.05, type=float)
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--start_random_frame", action="store_true")
    parser.add_argument("--save_intermediate", action="store_true")
    parser.add_argument("--fps", default=24, type=float)
    parser.add_argument("--out_dir", default="output/", type=str)
    args = parser.parse_args(args)
    # fmt: on

    from ..utility import parse_kwarg_list

    out_file = f"{args.out_dir}/{Path(args.video_file).stem}_{Path(args.styles[0]).stem}.mp4"
    video = transfer(
        args.video_file, args.styles, size=args.size, n_passes=args.n_passes,
        n_iters=args.n_iters, temporal_weight=args.temporal_weight,
        content_weight=args.content_weight, style_weight=args.style_weight,
        tv_weight=args.tv_weight, parameterization=args.parameterization,
        perceptor=args.perceptor,
        perceptor_kwargs=parse_kwarg_list(args.perceptor_kwargs),
        optimizer=args.optimizer, optimizer_kwargs=parse_kwarg_list(args.optimizer_kwargs),
        lr=args.lr, max_frames=args.max_frames,
        flow_models=tuple(args.flow_models), init_type=args.init_type,
        init_video=args.init_video, match_hist=args.match_hist,
        style_scale=args.style_scale, temporal_loss_after=args.temporal_loss_after,
        blend_factor=args.blend_factor, start_random_frame=args.start_random_frame,
        save_intermediate=out_file.replace(".mp4", "_intermediate.mp4") if args.save_intermediate else None,
        fps=args.fps,
    )
    Path(args.out_dir).mkdir(parents=True, exist_ok=True)
    write_video(video, out_file, fps=args.fps)
    print(out_file)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
