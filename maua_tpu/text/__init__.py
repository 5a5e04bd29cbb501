from .clip_text import CLIPTextConfig, encode_text, init_params, tokenize  # noqa: F401
