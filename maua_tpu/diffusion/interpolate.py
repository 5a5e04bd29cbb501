"""Latent interpolation video: slerp/spline through the latents of
input images, batch-decoded.

Rebuild of `maua/diffusion/interpolate.py:16-96` and the loop variant
`interp_loop.py`.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.latent import slerp_loops, spline_loops
from ..ops.io import load_image
from .processors.stable import StableDiffusion


def interpolate_latents(
    diffusion: StableDiffusion,
    images: List,
    n_frames: int = 64,
    method: str = "spline",
    loop: bool = True,
    batch_size: int = 8,
    renoise_t: Optional[float] = None,
    key=None,
) -> np.ndarray:
    """Encode images -> interpolate latents -> (optional partial
    renoise/denoise) -> batch decode (`interpolate.py:16-96`).
    Returns (n_frames, H, W, 3) in [-1, 1]."""
    key = key if key is not None else jax.random.PRNGKey(0)
    latents = jnp.concatenate([
        diffusion.encode(jnp.asarray(load_image(im)) * 2 - 1) for im in images
    ])  # (K, h, w, 4)
    k, h, w, c = latents.shape
    flat = latents.reshape(k, 1, h * w * c)
    if loop:
        interp = spline_loops if method == "spline" else slerp_loops
        path = interp(flat, n_frames, 1)
    else:
        # open path A -> B -> ... -> K (no wrap back to the first image)
        from ..audio.latent import slerp

        n_seg = k - 1
        t = jnp.linspace(0.0, n_seg, n_frames)
        seg = jnp.clip(t.astype(jnp.int32), 0, n_seg - 1)
        frac = t - seg
        segments = [slerp(flat[i : i + 1], flat[i + 1 : i + 2], frac)[:, 0] for i in range(n_seg)]
        path = jnp.stack([segments[int(s)][j] for j, s in enumerate(np.asarray(seg))])
    path = path.reshape(n_frames, h, w, c)

    frames = []
    for i in range(0, n_frames, batch_size):
        z = path[i : i + batch_size]
        if renoise_t is not None:
            z = diffusion(z, [], renoise_t, latent=True, key=jax.random.fold_in(key, i))
        frames.append(np.asarray(diffusion.decode(z)))
    return np.concatenate(frames)


def main(args=None):
    """CLI (the reference runs `interpolate.py` directly as a script)."""
    import argparse

    from ..ops.video import write_video
    from .image import get_diffusion_model

    parser = argparse.ArgumentParser(description="latent interpolation video between input images")
    parser.add_argument("images", nargs="+", type=str)
    parser.add_argument("--n_frames", default=64, type=int)
    parser.add_argument("--method", default="spline", choices=["spline", "slerp"])
    parser.add_argument("--no_loop", action="store_true")
    parser.add_argument("--renoise_t", default=None, type=float,
                        help="partially renoise+denoise each interpolated latent")
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--fps", default=12, type=float)
    parser.add_argument("--timesteps", default=50, type=int)
    parser.add_argument("--out_dir", default="output/", type=str)
    args = parser.parse_args(args)

    from pathlib import Path

    Path(args.out_dir).mkdir(parents=True, exist_ok=True)
    diffusion = get_diffusion_model("stable", timesteps=args.timesteps)
    frames = interpolate_latents(
        diffusion, args.images, n_frames=args.n_frames, method=args.method, loop=not args.no_loop,
        batch_size=args.batch_size, renoise_t=args.renoise_t,
    )
    stem = "_".join(Path(im).stem for im in args.images[:3])
    out_file = f"{args.out_dir}/{stem}_interp.mp4"
    write_video(frames, out_file, fps=args.fps, value_range=(-1, 1))
    print(out_file)
    return 0


if __name__ == "__main__":
    main()
