"""End-to-end self-supervised audio-reactive generation.

Rebuild of `selfsupervised/sample.py:36-101`: audio -> music
information -> seeded random Patch -> latent/noise windows -> StyleGAN2
render -> video.
"""

from __future__ import annotations


from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...audio.io import load_audio
from ...gan.wrappers import StyleGAN2, layer_names
from ...ops.signal import resample_1d
from ...ops.video import VideoWriter
from .mir import retrieve_music_information
from .patch import Patch


def generate(
    audio_file: str,
    model_file: Optional[str] = None,
    output_file: Optional[str] = None,
    fps: float = 24,
    seed: int = 42,
    batch_size: int = 8,
    downscale_factor: int = 1,
    n_palette: int = 16,
    stylegan_kwargs: Optional[dict] = None,
    max_seconds: Optional[float] = None,
    verbose: bool = True,
) -> str:
    """(`selfsupervised/sample.py:36-101`)"""
    audio, sr, duration = load_audio(audio_file, duration=max_seconds or -1)
    features, segmentations, tempo = retrieve_music_information(audio, sr)

    gan = StyleGAN2(model_file, **(stylegan_kwargs or {}))
    n_frames = round(duration * fps)

    # features are at hop 1024; resample everything to render fps
    features = {k: resample_1d(jnp.asarray(v), n_frames) for k, v in features.items()}
    seg_t = next(iter(segmentations.values())).shape[0]
    frame_idx = np.clip((np.arange(n_frames) * seg_t / n_frames).astype(int), 0, seg_t - 1)
    segmentations = {k: np.asarray(v)[frame_idx] for k, v in segmentations.items()}

    patch = Patch(features, segmentations, tempo, fps=fps, seed=seed)
    if verbose:
        print(patch)

    palette = gan.mapper(jax.random.normal(jax.random.PRNGKey(seed), (n_palette, gan.z_dim)))
    # per-layer noise sizes follow the synthesis layer resolutions
    sizes = [int(n.split(".")[0][1:]) for n in layer_names(gan.cfg)[1:]]
    latents, noise_modules = patch(palette, downscale_factor=downscale_factor, noise_sizes=sizes)

    # broadcast latents to w+ when the patch produced (T, 1, D)
    if latents.shape[1] != gan.num_ws:
        latents = jnp.tile(latents[:, :1], (1, gan.num_ws, 1))

    names = layer_names(gan.cfg)[1:]
    out_file = output_file or f"output/{Path(audio_file).stem}_patch{seed}.mp4"
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    res = gan.rcfg.output_size or (gan.res, gan.res)
    # encode-path pipelining (PERFORMANCE.md): I420 on device + fetch
    # of batch N overlapping batch N+1's synthesis
    from ...ops.video import ffmpeg_available, pipelined_frames

    yuv = ffmpeg_available() and res[0] % 2 == 0 and res[1] % 2 == 0
    with VideoWriter(out_file, res, fps, audio_file=audio_file, value_range=(0, 255),
                     pix_fmt="yuv420p" if yuv else "rgb24") as vid:
        def batches():
            for i in range(0, n_frames, batch_size):
                b = min(batch_size, n_frames - i)
                noises = {}
                for name, mod in zip(names, noise_modules):
                    win = mod(i, b)  # (b, h, w)
                    noises[name] = win[..., None]
                imgs = gan.synthesizer(latents[i : i + b], noises=noises)
                yield jnp.clip((imgs + 1) * 127.5, 0, 255).astype(jnp.uint8)
                if verbose and (i // batch_size) % 10 == 0:
                    print(f"frame {i}/{n_frames}")

        for f in pipelined_frames(batches(), "yuv420p" if yuv else "rgb24"):
            vid.write(f.tobytes())
    return out_file


def main(args=None):
    import argparse

    parser = argparse.ArgumentParser(description="self-supervised audio-reactive generation")
    parser.add_argument("--audio_file", required=True)
    parser.add_argument("--model_file", default=None)
    parser.add_argument("--output_file", default=None)
    parser.add_argument("--fps", default=24, type=float)
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--batch_size", default=8, type=int)
    args = parser.parse_args(args)
    print(generate(args.audio_file, args.model_file, args.output_file, fps=args.fps, seed=args.seed,
                   batch_size=args.batch_size))


if __name__ == "__main__":
    main()
