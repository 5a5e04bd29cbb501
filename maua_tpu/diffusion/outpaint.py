"""Outpainting: extend image borders with noise + sliced optimal
transport color matching + partial denoise.

Rebuild of `maua/diffusion/outpaint.py` (sliced_optimal_transport
:73-89, outpaint :92-161).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


from ..prompt import TextPrompt
from .processors.base import BaseDiffusionProcessor


def sliced_optimal_transport(source: jax.Array, target: jax.Array, n_slices: int = 32, key=None) -> jax.Array:
    """Color-match source pixels to the target distribution via
    1-D OT along random projections (`outpaint.py:73-89`)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    src = source.reshape(-1, source.shape[-1])
    tgt = target.reshape(-1, target.shape[-1])
    n = src.shape[0]

    def body(src, k):
        d = jax.random.normal(k, (src.shape[1],))
        d = d / jnp.linalg.norm(d)
        proj_s = src @ d
        proj_t = tgt @ d
        # match sorted order statistics (resample target to n points)
        idx_s = jnp.argsort(proj_s)
        sorted_t = jnp.sort(proj_t)
        pos = jnp.linspace(0, sorted_t.shape[0] - 1, n)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, sorted_t.shape[0] - 1)
        interp_t = sorted_t[lo] * (1 - (pos - lo)) + sorted_t[hi] * (pos - lo)
        delta = jnp.zeros(n).at[idx_s].set(interp_t - jnp.sort(proj_s))
        return src + delta[:, None] * d[None, :], None

    keys = jax.random.split(key, n_slices)
    src, _ = jax.lax.scan(body, src, keys)
    return src.reshape(source.shape)


def outpaint(
    diffusion: BaseDiffusionProcessor,
    img: jax.Array,  # (1, H, W, 3) in [-1, 1]
    expand: Tuple[int, int, int, int] = (64, 64, 64, 64),  # left, right, top, bottom
    text: Optional[str] = None,
    t_start: float = 0.4,
    noise_scale: float = 0.8,
    key=None,
    **diffusion_kwargs,
) -> jax.Array:
    """(`outpaint.py:92-161`): pad borders with color-matched noise,
    then partially denoise the full canvas."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    l, r, t, b = expand
    _, h, w, c = img.shape
    canvas = jnp.zeros((1, h + t + b, w + l + r, c))
    canvas = canvas.at[:, t : t + h, l : l + w, :].set(img)

    noise = noise_scale * jax.random.normal(k1, canvas.shape)
    noise = sliced_optimal_transport(noise, img, key=k2)
    mask = jnp.zeros((1, h + t + b, w + l + r, 1)).at[:, t : t + h, l : l + w, :].set(1.0)
    canvas = canvas * mask + noise * (1 - mask)

    prompts = [TextPrompt(text)] if text else []
    out = diffusion(canvas, prompts, t_start, key=k3, **diffusion_kwargs)
    # keep the original interior verbatim
    return out * (1 - mask) + canvas * mask


def main(args=None):
    """CLI (`outpaint.py:146-161`): `init` is an image path or "none"
    to synthesize the seed image from the prompt first."""
    import argparse
    from pathlib import Path

    import numpy as np

    from ..ops.io import save_image
    from ..prompt import ImagePrompt
    from .image import get_diffusion_model

    parser = argparse.ArgumentParser(description="diffusion outpainting")
    parser.add_argument("init", type=str, help='image path, or "none" to synthesize from the prompt')
    parser.add_argument("text", type=str)
    parser.add_argument("--t_start", default=0.4, type=float)
    parser.add_argument("--expand", default="64,64,64,64", type=str, help="left,right,top,bottom pixels")
    parser.add_argument("--size", default=512, type=int, help='seed image size when init is "none"')
    parser.add_argument("--sampler", default="euler_ancestral", type=str)
    parser.add_argument("--timesteps", default=50, type=int)
    parser.add_argument("--out_dir", default="output/", type=str)
    args = parser.parse_args(args)

    Path(args.out_dir).mkdir(parents=True, exist_ok=True)
    diffusion = get_diffusion_model("stable", sampler=args.sampler, timesteps=args.timesteps)
    out_name = args.text.replace(" ", "_")
    if args.init == "none":
        key = jax.random.PRNGKey(0)
        img = diffusion(jnp.zeros((1, args.size, args.size, 3)), [TextPrompt(args.text)], 0.0, key=key)
        save_image(np.asarray(img), f"{args.out_dir}/{out_name}.png")
    else:
        out_name = f"{Path(args.init).stem}_{out_name}"
        img = jnp.asarray(ImagePrompt(path=args.init).img)

    expand = tuple(int(s) for s in args.expand.split(","))
    out = outpaint(diffusion, img, expand=expand, text=args.text, t_start=args.t_start)
    out_file = f"{args.out_dir}/outpainted_{out_name}.png"
    save_image(np.asarray(out), out_file)
    print(out_file)
    return 0


if __name__ == "__main__":
    main()
