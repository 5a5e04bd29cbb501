from .processors.base import BaseDiffusionProcessor  # noqa: F401
