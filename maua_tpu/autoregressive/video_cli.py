"""Two-stage text-to-video CLI (the `cog/video/generate.py:1011-1190`
driver surface): stage-1 keyframes -> stage-2 dyadic interpolation ->
VQ decode -> PNG frames (+ mp4 when ffmpeg is available)."""

from __future__ import annotations

import argparse


def main(args=None):
    parser = argparse.ArgumentParser(description="two-stage autoregressive text-to-video")
    parser.add_argument("--text", required=True, type=str)
    parser.add_argument("--n_keyframes", default=3, type=int)
    parser.add_argument("--interpolation_rounds", default=1, type=int)
    parser.add_argument("--guidance_alpha", default=1.0, type=float,
                        help="token-level CFG vs a generic guider prompt (>1 strengthens the text)")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--top_k", default=64, type=int)
    parser.add_argument("--temperature", default=1.0, type=float)
    parser.add_argument("--fps", default=4.0, type=float)
    parser.add_argument("--checkpoint", default=None, type=str, help="transformer params .npz")
    parser.add_argument("--vq_checkpoint", default=None, type=str, help="taming VQGAN .ckpt/.pth")
    parser.add_argument("--out_dir", default="output/ar_video", type=str)
    args = parser.parse_args(args)

    import os

    import jax
    import numpy as np

    from ..ops.io import tensor2img
    from . import video as video_mod
    from . import vq
    from .transformer import ARConfig, init_params

    cfg = ARConfig(width=128, layers=2, heads=4, image_rows=8, image_cols=8, text_length=16, max_frames=5)
    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    vq_cfg = vq.VQConfig(codebook_size=cfg.vocab_size, base_channels=32, channel_mult=(1, 2, 4))
    if args.vq_checkpoint:
        import torch

        sd = torch.load(args.vq_checkpoint, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        vq_params = vq.params_from_torch({k: v.numpy() for k, v in sd.items()}, vq_cfg)
    else:
        vq_params = vq.init_params(jax.random.PRNGKey(args.seed + 1), vq_cfg)

    def tokenize(text):
        words = text.split()[: cfg.text_length]
        ids = [hash(w) % (cfg.text_vocab_size - 1) for w in words]
        return np.asarray([ids + [0] * (cfg.text_length - len(ids))], np.int64)

    guider = tokenize("video") if args.guidance_alpha != 1.0 else None
    frames = video_mod.generate_video(
        params, tokenize(args.text), cfg, vq_params, vq_cfg,
        n_keyframes=args.n_keyframes, interpolation_rounds=args.interpolation_rounds,
        key=jax.random.PRNGKey(args.seed), guider_text_tokens=guider,
        guidance_alpha=args.guidance_alpha, temperature=args.temperature, top_k=args.top_k,
    )  # (F, B, H, W, 3) uint8

    os.makedirs(args.out_dir, exist_ok=True)
    for f in range(frames.shape[0]):
        tensor2img(frames[f, 0][None].astype(np.float32) / 255.0).save(f"{args.out_dir}/frame_{f:04d}.png")
    try:
        from ..ops.video import write_video

        write_video(frames[:, 0], f"{args.out_dir}/video.mp4", fps=args.fps, value_range=(0, 255))
    except Exception as e:  # ffmpeg-less envs still get the PNGs
        print(f"mp4 mux skipped ({e})")
    print(args.out_dir)
