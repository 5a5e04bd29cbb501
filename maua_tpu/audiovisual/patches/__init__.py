from .base import MauaPatch, StyleGAN2Patch, get_patch_from_file  # noqa: F401
