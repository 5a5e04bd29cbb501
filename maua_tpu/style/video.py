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
from ..ops.image import resample
from ..ops.io import load_images
from ..ops.warp import grid_sample
from ..optimizers import load_optimizer

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
    perceptor: str = "kbc-vgg19",
    optimizer: str = "adam",
    lr: float = 0.05,
    flow_models=("farneback",),
    max_frames: Optional[int] = None,
    verbose: bool = True,
    key=None,
) -> np.ndarray:
    """(`maua/style/video.py:25-200`): returns stylized frames
    (T, H, W, 3) in [-1, 1]."""
    key = key if key is not None else jax.random.PRNGKey(0)
    frames, forward, backward, reliable = preprocess_optical_flow(
        video_file, get_flow_model(flow_models), max_frames=max_frames
    )
    n = len(frames)
    (styles,) = load_images(list(style_imgs))
    styles = [resample(jnp.asarray(im) * 2 - 1, size) for im in styles]

    percept = load_perceptor(perceptor)()
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

    opt, _ = load_optimizer(optimizer, lr, None, n_iters)

    def optimize(content, init, temporal_target, temporal_mask):
        content_feats = percept.get_features(content)
        content_targets = [content_feats[i] for i in percept.content_layers]

        def loss_fn(p):
            img = jnp.clip(p, -1, 1)
            feats = percept.get_features(img)
            loss = tv_weight * tv_loss(img)
            for i, t in zip(percept.content_layers, content_targets):
                loss = loss + content_weight * scaled_mse_loss(feats[i], t)
            for i, t in zip(percept.style_layers, style_targets):
                loss = loss + style_weight * scaled_mse_loss(gram_matrix(feats[i]), t)
            if temporal_target is not None:
                loss = loss + temporal_weight * jnp.mean(temporal_mask * jnp.square(img - temporal_target))
            return loss

        @jax.jit
        def step(p, s):
            v, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)
            return optax.apply_updates(p, updates), s

        p = init
        s = opt.init(p)
        for _ in range(n_iters):
            p, s = step(p, s)
        return jnp.clip(p, -1, 1)

    outputs = [c for c in contents]
    for pass_n in range(n_passes):
        forward_dir = pass_n % 2 == 0
        order = range(n) if forward_dir else range(n - 1, -1, -1)
        for f_i in order:
            prev_i = (f_i - 1) % n if forward_dir else (f_i + 1) % n
            # pull-warping prev into the current frame needs the flow
            # sampled AT the current frame pointing to prev, i.e.
            # flow_model(cur, prev): backward[prev_i] on the forward
            # pass, forward[f_i] on the backward pass (verified
            # empirically against a known-translation clip; the
            # reference's video diffusion builds exactly this flow,
            # maua/diffusion/video.py:146)
            flow = backward[prev_i] if forward_dir else forward[f_i]
            rel = reliable[prev_i] if forward_dir else reliable[f_i]
            warp = flow_warp_map(fit_flow(flow))
            warped_prev = grid_sample(outputs[prev_i], warp, padding_mode="border")
            mask = jnp.clip(fit_mask(rel), 0, 1)
            init = 0.5 * outputs[f_i] + 0.5 * (mask * warped_prev + (1 - mask) * outputs[f_i])
            outputs[f_i] = optimize(contents[f_i], init, warped_prev, mask)
        if verbose:
            print(f"pass {pass_n + 1}/{n_passes} done")

    return np.concatenate([np.asarray(o) for o in outputs])


def main(args=None):
    """CLI (reference `maua/style/video.py` argparse block)."""
    import argparse
    from pathlib import Path

    from ..ops.video import write_video

    # fmt: off
    parser = argparse.ArgumentParser(description="flow-consistent video style transfer")
    parser.add_argument("--video_file", required=True, type=str)
    parser.add_argument("--styles", required=True, nargs="+", type=str)
    parser.add_argument("--size", default=256, type=int)
    parser.add_argument("--n_passes", default=4, type=int)
    parser.add_argument("--n_iters", default=64, type=int)
    parser.add_argument("--temporal_weight", default=50.0, type=float)
    parser.add_argument("--content_weight", default=1.0, type=float)
    parser.add_argument("--style_weight", default=50.0, type=float)
    parser.add_argument("--tv_weight", default=10.0, type=float)
    parser.add_argument("--perceptor", default="kbc-vgg19", type=str)
    parser.add_argument("--optimizer", default="adam", type=str)
    parser.add_argument("--lr", default=0.05, type=float)
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--fps", default=24, type=float)
    parser.add_argument("--out_dir", default="output/", type=str)
    args = parser.parse_args(args)
    # fmt: on

    video = transfer(
        args.video_file, args.styles, size=args.size, n_passes=args.n_passes,
        n_iters=args.n_iters, temporal_weight=args.temporal_weight,
        content_weight=args.content_weight, style_weight=args.style_weight,
        tv_weight=args.tv_weight, perceptor=args.perceptor,
        optimizer=args.optimizer, lr=args.lr, max_frames=args.max_frames,
    )
    out_file = f"{args.out_dir}/{Path(args.video_file).stem}_{Path(args.styles[0]).stem}.mp4"
    write_video(video, out_file, fps=args.fps)
    print(out_file)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
