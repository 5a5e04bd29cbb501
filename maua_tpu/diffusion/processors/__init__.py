from .base import BaseDiffusionProcessor  # noqa: F401
