"""Remote Kandinsky/RuDALL-E API client.

Role of `maua/autoregressive/ru_dalle/api.py:10-53`: translate an
English prompt to Russian (the service expects Russian), POST it to a
hosted Kandinsky endpoint, decode the base64 PNG responses. Network
egress and the Marian translation checkpoint are unavailable in this
build environment, so the client raises a clear error at call time
(same pattern as the LAION scraper in `dataset/`); the payload/response
parsing is real and unit-testable.
"""

from __future__ import annotations

import base64
from io import BytesIO
from typing import Iterator


def build_request_payload(text: str, top_k: int = 1500, top_p: float = 0.99,
                          images_num: int = 4, rerank_top: int = 4) -> dict:
    """The service's JSON schema (`api.py:23-37`)."""
    return {
        "instances": [
            {
                "text": text,
                "top_k": top_k,
                "top_p": top_p,
                "images_num": images_num,
                "rerank_top": rerank_top,
                "hi_res": True,
            }
        ]
    }


def decode_response(response_json: dict) -> Iterator:
    """Yield PIL images from the service's base64 `images` list
    (`api.py:41-45`)."""
    from PIL import Image

    for imgtext in response_json["images"]:
        yield Image.open(BytesIO(base64.b64decode(imgtext.encode("ascii"))))


def request_kandinsky(input_text: str, request_url: str, top_k: int = 1500, top_p: float = 0.99,
                      images_num: int = 4, rerank_top: int = 4, verbose: bool = False):
    """POST a (translated) prompt to the hosted endpoint. Requires
    network egress and a Marian en-ru checkpoint; neither exists here."""
    raise RuntimeError(
        "request_kandinsky needs network egress (the hosted Kandinsky endpoint and the "
        "Helsinki-NLP/opus-mt-en-ru translation model); this environment has none. "
        "Use build_request_payload/decode_response with your own transport, or generate "
        "locally via maua_tpu.autoregressive.oversample / .video."
    )
