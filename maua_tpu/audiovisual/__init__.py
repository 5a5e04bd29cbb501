from . import audioreactive  # noqa: F401
from .generate import generate_audiovisual_from_patch  # noqa: F401
