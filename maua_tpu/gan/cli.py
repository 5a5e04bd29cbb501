"""StyleGAN generation CLI (`maua/GAN/generate_images.py:52-117`)."""

from __future__ import annotations

import argparse


def main(args=None):
    # fmt: off
    parser = argparse.ArgumentParser(description="StyleGAN image generation")
    parser.add_argument("--model_file", default=None, type=str)
    parser.add_argument("--seeds", default="0-8", type=str)
    parser.add_argument("--truncation", default=1.0, type=float)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--out_size", default=None, type=str, help="w,h output size")
    parser.add_argument("--resize_strategy", default="stretch", type=str)
    parser.add_argument("--resize_layer", default=0, type=int)
    parser.add_argument("--sampling", default="random", choices=["random", "langevin", "polarity", "jacnorm"])
    parser.add_argument("--grid", action="store_true")
    parser.add_argument("--out_dir", default="output/", type=str)
    args = parser.parse_args(args)
    # fmt: on

    from .analysis import generate_images
    from .wrappers import StyleGAN2

    out_size = tuple(int(v) for v in args.out_size.split(",")) if args.out_size else None
    gan = StyleGAN2(args.model_file, output_size=out_size, strategy=args.resize_strategy, layer=args.resize_layer)
    generate_images(
        gan, seeds=args.seeds, truncation=args.truncation, batch_size=args.batch_size,
        out_dir=args.out_dir, grid=args.grid, sampling_strategy=args.sampling,
    )
    print(args.out_dir)
