from .image import MODEL_NAMES, upscale, upscale_image  # noqa: F401
