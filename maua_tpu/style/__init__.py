from .image import transfer  # noqa: F401
