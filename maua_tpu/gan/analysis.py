"""Model blending, SeFa semantic decomposition, image-grid generation.

Rebuild of `maua/GAN/blending.py:22-78` (layer-wise checkpoint
interpolation by resolution midpoint), `maua/GAN/decomposition/
sefa.py:5` (semantic axes from weight SVD), and
`maua/GAN/generate_images.py:19-117` (seeds -> latents -> batched
synthesis -> PNG/grid).
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import stylegan2 as sg2



def blend_models(
    params_lo: Dict,
    params_hi: Dict,
    cfg: sg2.SG2Config,
    midpoint_resolution: int = 32,
    blend_width: Optional[float] = None,
) -> Dict:
    """Layer-wise blend of two generators: low-resolution layers from
    `params_lo`, high-resolution from `params_hi`, with an optional
    smooth transition (`GAN/blending.py:22-78`)."""
    mid_log = math.log2(midpoint_resolution)

    def layer_weight(res: int) -> float:
        if blend_width is None:
            return 0.0 if res <= midpoint_resolution else 1.0
        x = (math.log2(res) - mid_log) / blend_width
        return float(np.clip(x + 0.5, 0, 1))

    out = {"mapping": jax.tree_util.tree_map(lambda a, b: a, params_lo["mapping"], params_hi["mapping"]),
           "synthesis": {}}
    for res in cfg.block_resolutions:
        t = layer_weight(res)
        out["synthesis"][f"b{res}"] = jax.tree_util.tree_map(
            lambda a, b: a * (1 - t) + b * t, params_lo["synthesis"][f"b{res}"], params_hi["synthesis"][f"b{res}"]
        )
    return out


def sefa(params: Dict, cfg: sg2.SG2Config, n_components: int = 10, layers: Optional[List[str]] = None):
    """SeFa: closed-form semantic factors from the SVD of the style
    modulation weights (`decomposition/sefa.py:5`).
    Returns (directions (k, w_dim), singular values)."""
    mats = []
    for res in cfg.block_resolutions:
        block = params["synthesis"][f"b{res}"]
        for conv in ("conv0", "conv1"):
            if conv in block:
                name = f"b{res}.{conv}"
                if layers is not None and name not in layers:
                    continue
                mats.append(block[conv]["affine"]["w"])  # (w_dim, ci)
    A = jnp.concatenate(mats, axis=1)  # (w_dim, sum ci)
    u, s, _ = jnp.linalg.svd(A, full_matrices=False)
    return u[:, :n_components].T, s[:n_components]


def apply_direction(ws: jax.Array, direction: jax.Array, magnitude: float) -> jax.Array:
    """Move w+ latents along a SeFa direction."""
    return ws + magnitude * direction[None, None, :]


def generate_images(
    generator,
    seeds: str = "0-8",
    truncation: float = 1.0,
    batch_size: int = 8,
    out_dir: Optional[str] = None,
    grid: bool = False,
    sampling_strategy: str = "random",
    key=None,
    class_idx: Optional[int] = None,
    translation=None,
    rotation=None,
    langevin_critic: str = "discriminator",
) -> np.ndarray:
    """(`GAN/generate_images.py:19-49`): seeds -> z (4 strategies via
    gan.sampling) -> class one-hot / SG3 transforms -> batched
    synthesis -> images / files. Non-random strategies synthesize at
    truncation 1 like the reference (`generate_images.py:46`)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    if sampling_strategy == "random":
        z = generator.get_z_latents(seeds)
    else:
        from .sampling import sample_latents

        n = generator.get_z_latents(seeds).shape[0]
        z = sample_latents(
            sampling_strategy, key, n, generator.params, generator.cfg,
            generator=generator, critic=langevin_critic,
        )
        truncation = 1.0
    c = None
    if class_idx is not None:
        c_dim = getattr(generator.cfg, "c_dim", 0)
        if not c_dim:
            raise ValueError("class_idx given but the model is unconditional (c_dim=0)")
        c = jax.nn.one_hot(jnp.full((z.shape[0],), class_idx), c_dim)
    ws = generator.mapper(z, truncation=truncation) if c is None else generator.mapper(z, c, truncation=truncation)
    T = ws.shape[0]
    render_kw = {}
    if translation is not None:
        render_kw["translation"] = jnp.tile(jnp.asarray(translation, jnp.float32).reshape(1, 2), (T, 1))
    if rotation is not None:
        render_kw["rotation"] = jnp.full((T,), float(rotation), jnp.float32)
    frames = list(generator.render(ws, batch_size=batch_size, **render_kw))
    imgs = np.stack(frames)
    if out_dir is not None:
        from ..ops.io import tensor2img

        os.makedirs(out_dir, exist_ok=True)
        if grid:
            n = len(imgs)
            cols = int(math.ceil(math.sqrt(n)))
            rows = int(math.ceil(n / cols))
            h, w, c = imgs[0].shape
            canvas = np.zeros((rows * h, cols * w, c), np.uint8)
            for i, im in enumerate(imgs):
                r, col = divmod(i, cols)
                canvas[r * h : (r + 1) * h, col * w : (col + 1) * w] = im
            tensor2img(canvas[None].astype(np.float32) / 255).save(f"{out_dir}/grid.png")
        else:
            for i, im in enumerate(imgs):
                tensor2img(im[None].astype(np.float32) / 255).save(f"{out_dir}/seed_{i:04d}.png")
    return imgs
