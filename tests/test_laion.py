"""Offline tests for the LAION CLIP-retrieval scraper
(reference: maua/dataset/laion_clip_retrieval.py). Network transports
are injected so no test touches the wire."""

import io
import json

import numpy as np
import pytest

from maua_tpu.dataset import laion_clip_retrieval as lcr


def test_build_knn_payload_wire_format():
    payload = json.loads(lcr.build_knn_payload(text="a blue dog", num_images=7))
    assert payload["text"] == "a blue dog"
    assert payload["image"] is None and payload["image_url"] is None
    assert payload["num_images"] == 7 and payload["num_result_ids"] == 7
    assert payload["indice_name"] == "laion5B"
    # the service's string-typed quirks (laion_clip_retrieval.py:83-84)
    assert payload["aesthetic_score"] == "9"
    assert payload["aesthetic_weight"] == "0.5"
    assert payload["use_violence_detector"] is True
    # disabling the aesthetic re-rank ships the literal '""'
    assert json.loads(lcr.build_knn_payload(text="x", aesthetic_score=0))["aesthetic_score"] == '""'


def test_build_knn_payload_image_prompt(tmp_path):
    f = tmp_path / "img.bin"
    f.write_bytes(b"\x89PNG\r\n\x1a\nxyz")
    payload = json.loads(lcr.build_knn_payload(image_file=str(f)))
    import base64

    assert base64.b64decode(payload["image"]) == b"\x89PNG\r\n\x1a\nxyz"
    assert payload["text"] is None


def test_parse_knn_response_dedup_order():
    raw = json.dumps([
        {"url": "http://a/1.jpg", "similarity": 0.9},
        {"url": "http://b/2.jpg"},
        {"url": "http://a/1.jpg"},
        {"caption": "no url row"},
    ])
    assert lcr.parse_knn_response(raw) == ["http://a/1.jpg", "http://b/2.jpg"]
    with pytest.raises(ValueError):
        lcr.parse_knn_response(json.dumps({"not": "a list"}))


def test_retrieve_merges_prompts():
    posts = []

    def fake_post(url, data):
        posts.append((url, json.loads(data)))
        n = len(posts)
        return json.dumps([{"url": f"http://img/{n}.jpg"}, {"url": "http://img/shared.jpg"}])

    urls = lcr.retrieve(texts=["cat"], urls=["http://seed.jpg"], http_post=fake_post)
    assert posts[0][0] == lcr.KNN_ENDPOINT
    assert posts[0][1]["text"] == "cat" and posts[0][1]["image_url"] is None
    assert posts[1][1]["image_url"] == "http://seed.jpg" and posts[1][1]["text"] is None
    # cross-prompt dedup, order preserved
    assert urls == ["http://img/1.jpg", "http://img/shared.jpg", "http://img/2.jpg"]


def test_filename_for_and_sniffer():
    png = b"\x89PNG\r\n\x1a\n" + b"0" * 16
    assert lcr.sniff_extension(png) == "png"
    assert lcr.sniff_extension(b"\xff\xd8\xff\xe0rest") == "jpg"
    assert lcr.sniff_extension(b"RIFF....WEBPrest") == "webp"
    assert lcr.sniff_extension(b"plain text") is None
    # content-disposition wins over the url path; extension re-sniffed
    name = lcr.filename_for(
        "http://x/path/photo%20one.jpeg",
        {"Content-Disposition": 'attachment; filename="My Pic.jpeg"'},
        png,
    )
    assert name == "My_Pic.png"
    # url-path fallback with percent-decoding
    assert lcr.filename_for("http://x/photo%20one.jpeg", {}, png) == "photo_one.png"


def test_image_size_from_bytes():
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((12, 34, 3), np.uint8)).save(buf, format="PNG")
    assert lcr.image_size_from_bytes(buf.getvalue()) == (34, 12)
    assert lcr.image_size_from_bytes(b"not an image") == (-1, -1)


def test_download_min_size_and_write(tmp_path):
    from PIL import Image

    big = io.BytesIO(); Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(big, format="PNG")
    small = io.BytesIO(); Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(small, format="PNG")
    blobs = {"http://x/big.png": big.getvalue(), "http://x/small.png": small.getvalue()}

    def fake_get(url, byte_range=None):
        return blobs[url], {"Content-Type": "image/png"}

    n = lcr.download(list(blobs), str(tmp_path), min_size=32, http_get=fake_get, workers=2)
    assert n == 1
    assert (tmp_path / "big.png").exists()
    assert not (tmp_path / "small.png").exists()
