"""GAN training CLI with a plugin registry.

Rebuild of the reference's reflection-based plugin flag system
(`maua/GAN/training/__main__.py:83-161`: components discovered from
losses/models/latent_spaces/augmentation dirs, each contributing
argparse args via add_model_specific_args + build_by_name). Here a
declarative registry serves the same role; every component registers
its flags and a builder.
"""

from __future__ import annotations

import argparse
from typing import Dict


class Component:
    """Plugin interface (`__main__.py:83-116` contract)."""

    name: str = "base"

    @staticmethod
    def add_model_specific_args(parser: argparse.ArgumentParser):
        return parser

    @staticmethod
    def build(args):
        raise NotImplementedError


REGISTRY: Dict[str, Dict[str, type]] = {"losses": {}, "models": {}, "augmentation": {}}


def register(kind: str):
    def deco(cls):
        REGISTRY[kind][cls.name] = cls
        return cls

    return deco


@register("losses")
class SoftplusLoss(Component):
    name = "softplus"

    @staticmethod
    def build(args):
        return "logistic"


@register("losses")
class BCELoss(Component):
    name = "cross_entropy"

    @staticmethod
    def build(args):
        return "bce"


@register("models")
class StyleGAN2Model(Component):
    name = "stylegan2"

    @staticmethod
    def add_model_specific_args(parser):
        parser.add_argument("--channel_base", default=32768, type=int)
        parser.add_argument("--channel_max", default=512, type=int)
        return parser

    @staticmethod
    def build(args):
        from .discriminator import D2Config
        from .stylegan2 import SG2Config

        g = SG2Config(img_resolution=args.resolution, channel_base=args.channel_base,
                      channel_max=args.channel_max, num_fp16_res=0)
        d = D2Config(img_resolution=args.resolution, channel_base=args.channel_base,
                     channel_max=args.channel_max)
        return g, d


def build_by_name(kind: str, name: str, args):
    """(`__main__.py:136-144`)"""
    if name not in REGISTRY[kind]:
        raise ValueError(f"unknown {kind} component {name!r}; options: {sorted(REGISTRY[kind])}")
    return REGISTRY[kind][name].build(args)


def main(args=None):
    parser = argparse.ArgumentParser(description="GAN training")
    parser.add_argument("--input_dir", required=True, type=str)
    parser.add_argument("--resolution", default=64, type=int)
    parser.add_argument("--model", default="stylegan2", choices=sorted(REGISTRY["models"]))
    parser.add_argument("--loss", default="softplus", choices=sorted(REGISTRY["losses"]))
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--total_steps", default=10_000, type=int)
    parser.add_argument("--eval_every", default=1_000, type=int)
    parser.add_argument("--lr", default=2.5e-3, type=float)
    parser.add_argument("--out_dir", default="workspace/gan_training", type=str)
    # plugin flags (reflection role)
    for kind in REGISTRY.values():
        for comp in kind.values():
            comp.add_model_specific_args(parser)
    args = parser.parse_args(args)

    from . import training as tr
    from .data import ImageDataset, build_cache
    from .train_loop import FitConfig, fit

    g_cfg, d_cfg = build_by_name("models", args.model, args)
    loss = build_by_name("losses", args.loss, args)
    t_cfg = tr.TrainConfig(g_lr=args.lr, d_lr=args.lr, loss=loss,
                           blur_init_sigma=getattr(args, "blur_init_sigma", 0.0),
                           blur_fade_kimg=getattr(args, "blur_fade_kimg", 200.0))
    cache = build_cache(args.input_dir, args.resolution)
    dataset = ImageDataset(cache, args.batch_size)
    fit(dataset, g_cfg, d_cfg, t_cfg,
        FitConfig(total_steps=args.total_steps, eval_every=args.eval_every, out_dir=args.out_dir))


if __name__ == "__main__":
    main()


@register("models")
class DCGANModel(Component):
    name = "deepconvolutional"

    @staticmethod
    def add_model_specific_args(parser):
        parser.add_argument("--dcgan_base", default=64, type=int)
        return parser

    @staticmethod
    def build(args):
        from .training import GenericModel

        m = GenericModel("dcgan", args.resolution, z_dim=100, base=getattr(args, "dcgan_base", 64))
        return m, m


@register("models")
class HyperMixerModel(Component):
    name = "stylehypermixer"

    @staticmethod
    def build(args):
        from .training import GenericModel

        m = GenericModel("hypermixer", args.resolution, z_dim=64)
        return m, m


@register("models")
class DeepInvolutionalModel(Component):
    name = "deepinvolutional"

    @staticmethod
    def add_model_specific_args(parser):
        parser.add_argument("--involution_base", default=32, type=int)
        return parser

    @staticmethod
    def build(args):
        from .training import GenericModel

        m = GenericModel("involution", args.resolution, z_dim=100,
                         base=getattr(args, "involution_base", 32))
        return m, m


@register("models")
class SteerableModel(Component):
    name = "steerable"

    @staticmethod
    def build(args):
        from .training import GenericModel

        m = GenericModel("steerable", args.resolution, z_dim=128, base=16)
        return m, m


@register("augmentation")
class InitialBlur(Component):
    """Fade-out blur on D inputs (`training/augmentation/blur.py`)."""

    name = "initial_blur"

    @staticmethod
    def add_model_specific_args(parser):
        parser.add_argument("--blur_init_sigma", default=0.0, type=float,
                            help="strength of the initial blur (0 disables)")
        parser.add_argument("--blur_fade_kimg", default=200.0, type=float,
                            help="kimg over which the blur fades out")
        return parser

    @staticmethod
    def build(args):
        return (getattr(args, "blur_init_sigma", 0.0), getattr(args, "blur_fade_kimg", 200.0))


@register("augmentation")
class ADAAugment(Component):
    name = "ada"

    @staticmethod
    def add_model_specific_args(parser):
        parser.add_argument("--augment_p", default=0.2, type=float)
        return parser

    @staticmethod
    def build(args):
        return getattr(args, "augment_p", 0.2)
