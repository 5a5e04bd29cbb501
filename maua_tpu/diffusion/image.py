"""Multi-resolution diffusion image pipeline + `image_sample` entry.

Rebuild of `maua/diffusion/image.py` (initialize_image :61-74,
get_diffusion_model :77-129, MultiResolutionDiffusionProcessor
:132-214, image_sample :217-282, CLI :285-322). Layout is NHWC [-1,1];
tiles run as one batched device call instead of a host loop where they
fit memory.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple, Union
from uuid import uuid4

import jax
import jax.numpy as jnp
import numpy as np

from ..grad import CLIPGrads, ColorMatchGrads, LPIPSGrads, VGGGrads
from ..ops.image import destitch, resample, restitch
from ..ops.io import load_image, save_image
from ..ops.noise import create_perlin_noise
from ..prompt import ContentPrompt, ImagePrompt, StylePrompt, TextPrompt
from .processors.base import BaseDiffusionProcessor
from .processors.guided import GuidedDiffusion
from .processors.stable import StableDiffusion


def round64(n: float) -> int:
    return round(n / 64) * 64


def initialize_image(init: Optional[str], shape: Tuple[int, int], key=None) -> jax.Array:
    """(`maua/diffusion/image.py:61-74`)"""
    key = key if key is not None else jax.random.PRNGKey(0)
    h, w = shape
    if init == "random":
        return jax.random.normal(key, (1, h, w, 3))
    if init == "perlin":
        k1, k2 = jax.random.split(key)
        col = create_perlin_noise(k1, [1.5**-i * 0.5 for i in range(12)], 1, 1, grayscale=False)
        gray = create_perlin_noise(k2, [1.5**-i * 0.5 for i in range(8)], 4, 4, grayscale=True)
        col = jax.image.resize(col[None], (1, h, w, 3), "bicubic")
        gray = jax.image.resize(gray[None], (1, h, w, 3), "bicubic")
        return col + gray - 1.0
    if init is not None:
        img = load_image(init) * 2.0 - 1.0
        return resample(jnp.asarray(img), (h, w))
    raise Exception("init strategy not recognized!")


def get_diffusion_model(
    diffusion: Union[str, BaseDiffusionProcessor] = "stable",
    timesteps: int = 50,
    sampler: str = "lms",
    guidance_speed: str = "fast",
    clip_scale: float = 0.0,
    lpips_scale: float = 0.0,
    style_scale: float = 0.0,
    color_match_scale: float = 0.0,
    cfg_scale: float = 5.0,
    image: Optional[str] = None,
    **model_kwargs,
) -> BaseDiffusionProcessor:
    """(`maua/diffusion/image.py:77-129`). Passing `image` selects the
    image-conditioned stable variant (the reference's "pinkney"
    checkpoint choice, `maua/diffusion/image.py:111`)."""
    if isinstance(diffusion, BaseDiffusionProcessor):
        return diffusion
    grad_modules = (
        ([CLIPGrads(scale=clip_scale)] if clip_scale > 0 else [])
        + ([LPIPSGrads(scale=lpips_scale)] if lpips_scale > 0 else [])
        + ([VGGGrads(scale=style_scale)] if style_scale > 0 else [])
        + ([ColorMatchGrads(scale=color_match_scale)] if color_match_scale > 0 else [])
    )
    if diffusion == "guided":
        return GuidedDiffusion(grad_modules=grad_modules, sampler=sampler, timesteps=timesteps,
                               speed=guidance_speed, **model_kwargs)
    if diffusion == "latent":
        from .processors.latent import LatentDiffusion

        smplr = sampler if sampler in ("plms", "ddim") else "plms"
        return LatentDiffusion(cfg_scale=cfg_scale, sampler=smplr, timesteps=timesteps, **model_kwargs)
    if diffusion == "glide":
        from .processors.glide import GLIDE

        return GLIDE(cfg_scale=cfg_scale, timesteps=timesteps, **model_kwargs)
    if diffusion == "glid3xl":
        from .processors.glide import GLID3XL

        return GLID3XL(grad_modules=grad_modules, cfg_scale=cfg_scale, timesteps=timesteps, **model_kwargs)
    if diffusion == "stable":
        smplr = sampler if sampler not in ("plms", "ddim", "p") else "lms"
        model_kwargs.setdefault("image_cond", image is not None)
        return StableDiffusion(grad_modules=grad_modules, cfg_scale=cfg_scale, sampler=smplr,
                               timesteps=timesteps, **model_kwargs)
    raise Exception(f"Diffusion model not recognized: {diffusion}")


class MultiResolutionDiffusionProcessor:
    """(`maua/diffusion/image.py:132-214`)"""

    def __call__(
        self,
        diffusion: BaseDiffusionProcessor,
        init: Optional[str] = "random",
        text: Optional[str] = None,
        image: Optional[str] = None,
        content: Optional[str] = None,
        style: Optional[str] = None,
        schedule: Optional[Dict[Tuple[int, int], float]] = None,
        pre_hook: Optional[Callable] = None,
        post_hook: Optional[Callable] = None,
        super_res_model: Optional[str] = None,
        tile_size: Optional[int] = None,
        stitch: bool = True,
        max_batch: int = 4,
        verbose: bool = True,
        key=None,
    ) -> jax.Array:
        schedule = schedule or {(512, 512): 0.5}
        key = key if key is not None else jax.random.PRNGKey(0)
        shapes = [(round64(h), round64(w)) for h, w in schedule.keys()]
        t_starts = list(schedule.values())
        if tile_size is None:
            tile_size = diffusion.image_size

        key, sub = jax.random.split(key)
        img = initialize_image(init, shapes[0], sub)
        # reference anchors content guidance to the scale-0 init image at
        # every scale (maua/diffusion/image.py:191-197), not to the
        # previous scale's output — capture it once, resize per scale
        init_content = np.asarray((img + 1.0) / 2.0)

        for scale, t_start in enumerate(t_starts):
            if verbose:
                print(f"Current size: {shapes[scale][1]}x{shapes[scale][0]}")
            if scale != 0:
                if super_res_model:
                    from ..oom import is_oom_error
                    from ..super.image import upscale_image

                    try:
                        img = upscale_image((img + 1) / 2, model_name=super_res_model) * 2 - 1
                    except Exception as e:
                        # skip the SR pass on device OOM; the lanczos
                        # resize below still reaches the target shape
                        # (`maua/diffusion/image.py:171-177`)
                        if not is_oom_error(e):
                            raise
                        print("device OOM during super-resolution; continuing without it")
                img = resample(img, shapes[scale])

            if pre_hook:
                img = pre_hook(img)

            needs_stitching = stitch and min(shapes[scale]) > tile_size
            if needs_stitching:
                img = destitch(img, tile_size=tile_size)

            # content target: the ORIGINAL init image resized to the
            # current scale (ImagePrompt expects [0, 1] input)
            if content is not None:
                content_kwargs = dict(path=content)
            else:
                content_kwargs = dict(
                    img=np.asarray(resample(jnp.asarray(init_content), shapes[scale]))
                )
            prompts = [ContentPrompt(**content_kwargs)] if not needs_stitching else []
            if style is not None:
                prompts.append(StylePrompt(path=style, size=shapes[scale]))
            if text is not None:
                prompts.append(TextPrompt(text))
            if image is not None:
                prompts.append(ImagePrompt(path=image))

            key, sub = jax.random.split(key)
            if img.shape[0] > max_batch:
                from ..oom import is_oom_error

                outs = []
                i = 0
                while i < img.shape[0]:
                    try:
                        outs.append(diffusion(img[i : i + max_batch], prompts, t_start, verbose=False,
                                              key=jax.random.fold_in(sub, i)))
                    except Exception as e:
                        # halve the tile batch on device OOM and retry
                        # (`maua/diffusion/image.py:199-205` max_batch role)
                        if not is_oom_error(e) or max_batch <= 1:
                            raise
                        max_batch = max(max_batch // 2, 1)
                        print(f"device OOM during tile batch; retrying with max_batch={max_batch}")
                        continue
                    i += max_batch
                img = jnp.concatenate(outs)
            else:
                img = diffusion(img, prompts, t_start, verbose=verbose, key=sub)

            if needs_stitching:
                img = restitch(img, *shapes[scale])

            if post_hook:
                img = post_hook(img)

        return img


def get_output_name(text=None, image=None, style=None, init=None, unique=True):
    """(`maua/diffusion/image.py:39-49`)"""
    out_name = str(uuid4())[:6] if unique else "out"
    if text is not None:
        out_name = f"{text.replace(' ', '_')}_{out_name}"
    if image is not None:
        out_name = f"{Path(image).stem}_{out_name}"
    if style is not None:
        out_name = f"{Path(style).stem}_{out_name}"
    if init is not None and init not in ("random", "perlin"):
        out_name = f"{Path(init).stem}_{out_name}"
    return out_name


def image_sample(
    init: str = "random",
    text: Optional[str] = None,
    image: Optional[str] = None,
    content: Optional[str] = None,
    style: Optional[str] = None,
    sizes=((512, 512),),
    skips=(0.0,),
    diffusion: Union[str, BaseDiffusionProcessor] = "stable",
    timesteps: int = 50,
    sampler: str = "lms",
    guidance_speed: str = "fast",
    clip_scale: float = 0.0,
    lpips_scale: float = 0.0,
    style_scale: float = 0.0,
    color_match_scale: float = 0.0,
    cfg_scale: float = 5.0,
    super_res_model: Optional[str] = None,
    tile_size: Optional[int] = None,
    stitch: bool = True,
    max_batch: int = 4,
    match_hist: bool = False,
    sharpness: float = 0.0,
    verbose: bool = True,
    key=None,
    **model_kwargs,
) -> jax.Array:
    """Text-to-image / image-to-image entry point
    (`maua/diffusion/image.py:217-282`). Returns (1, H, W, 3) in
    [-1, 1]. `match_hist` histogram-matches the init to the --style
    image before each scale; `sharpness` > 0 sharpens after each scale
    (the reference's pre/post hooks, `image.py:256-259`)."""
    from functools import partial

    from ..ops.image import match_histogram, sharpen

    model = get_diffusion_model(
        diffusion, timesteps=timesteps, sampler=sampler, guidance_speed=guidance_speed,
        clip_scale=clip_scale, lpips_scale=lpips_scale, style_scale=style_scale,
        color_match_scale=color_match_scale, cfg_scale=cfg_scale, image=image, **model_kwargs,
    )
    pre_hook = None
    if match_hist and style is not None:
        style_img = jnp.asarray(StylePrompt(path=style).img)  # already [-1, 1]
        pre_hook = lambda img: match_histogram(img, style_img)
    post_hook = partial(sharpen, strength=sharpness) if sharpness > 0 else None
    schedule = {tuple(s): float(k) for s, k in zip(sizes, list(skips) + [skips[-1]] * (len(sizes) - len(skips)))}
    return MultiResolutionDiffusionProcessor()(
        diffusion=model, init=init, text=text, image=image, content=content, style=style,
        schedule=schedule, super_res_model=super_res_model, tile_size=tile_size, stitch=stitch,
        max_batch=max_batch, pre_hook=pre_hook, post_hook=post_hook, verbose=verbose, key=key,
    )


def main(args=None):
    # fmt: off
    parser = argparse.ArgumentParser(description="multi-resolution diffusion image synthesis")
    parser.add_argument("--init", default="random", type=str)
    parser.add_argument("--text", default=None, type=str)
    parser.add_argument("--image", default=None, type=str)
    parser.add_argument("--content", default=None, type=str)
    parser.add_argument("--style", default=None, type=str)
    parser.add_argument("--sizes", default="512,512", type=str, help="semicolon-separated h,w pairs")
    parser.add_argument("--skips", default="0", type=str, help="comma-separated t_start per scale")
    parser.add_argument("--diffusion", default="stable", type=str)
    parser.add_argument("--timesteps", default=50, type=int)
    parser.add_argument("--sampler", default="lms", type=str)
    parser.add_argument("--guidance_speed", default="fast", type=str)
    parser.add_argument("--clip_scale", default=0.0, type=float)
    parser.add_argument("--lpips_scale", default=0.0, type=float)
    parser.add_argument("--style_scale", default=0.0, type=float)
    parser.add_argument("--color_match_scale", default=0.0, type=float)
    parser.add_argument("--cfg_scale", default=5.0, type=float)
    parser.add_argument("--super_res", default=None, type=str)
    parser.add_argument("--tile_size", default=None, type=int)
    parser.add_argument("--stitch", action=argparse.BooleanOptionalAction, default=True,
                        help="tiled synthesis of images larger than --tile_size")
    parser.add_argument("--max_batch", default=4, type=int)
    parser.add_argument("--match_hist", action="store_true",
                        help="match the init histogram to the --style image before each scale")
    parser.add_argument("--sharpness", default=0.0, type=float,
                        help="sharpen after each diffusion scale (0 disables, 1.0 leaves unchanged)")
    parser.add_argument("--number", default=1, type=int, help="how many images to render")
    parser.add_argument("--device", default=None, type=str,
                        help='"cpu" forces the CPU backend; default uses the TPU')
    parser.add_argument("--out_dir", default="output/", type=str)
    args = parser.parse_args(args)
    # fmt: on

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    sizes = [tuple(int(v) for v in s.split(",")) for s in args.sizes.split(";")]
    skips = [float(s) for s in args.skips.split(",")]
    Path(args.out_dir).mkdir(parents=True, exist_ok=True)
    for n in range(args.number):
        img = image_sample(
            init=args.init, text=args.text, image=args.image, content=args.content, style=args.style,
            sizes=sizes, skips=skips, diffusion=args.diffusion, timesteps=args.timesteps,
            sampler=args.sampler, guidance_speed=args.guidance_speed, clip_scale=args.clip_scale,
            lpips_scale=args.lpips_scale, style_scale=args.style_scale,
            color_match_scale=args.color_match_scale, cfg_scale=args.cfg_scale,
            super_res_model=args.super_res, tile_size=args.tile_size, stitch=args.stitch,
            max_batch=args.max_batch, match_hist=args.match_hist, sharpness=args.sharpness,
            key=jax.random.PRNGKey(n),
        )
        suffix = f"_{n}" if args.number > 1 else ""
        out = f"{args.out_dir}/{get_output_name(args.text, args.image, args.style, args.init)}{suffix}.png"
        save_image(np.asarray(img), out)
        print(out)


if __name__ == "__main__":
    main()
