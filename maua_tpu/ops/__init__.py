from .signal import (  # noqa: F401
    compress,
    expand,
    gaussian_filter,
    normalize,
    percentile,
    percentile_clip,
    resample_1d,
)
