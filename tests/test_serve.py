"""Serving layer: micro-batcher semantics, GAN/upscale services, HTTP."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from maua_tpu.serve import (
    GANImageService,
    MicroBatcher,
    ServiceMetrics,
    UpscaleService,
    make_http_server,
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def test_microbatcher_coalesces_and_routes():
    calls = []

    def run(batch):
        # static shape contract: every call sees exactly max_batch rows
        assert batch["x"].shape[0] == 4
        calls.append(batch["x"].copy())
        time.sleep(0.05)  # device-step stand-in so later submits queue up
        return batch["x"] * 2.0

    mb = MicroBatcher(run, max_batch=4, max_wait_ms=40.0)
    futs = [mb.submit({"x": np.full((1, 3), float(i))}) for i in range(6)]
    results = [f.result(timeout=10) for f in futs]
    for i, r in enumerate(results):
        assert np.allclose(r, 2.0 * i), (i, r)
    mb.close()
    # 6 requests at max_batch 4 -> exactly 2 device calls (4 + 2-padded)
    assert len(calls) == 2, len(calls)
    snap = mb.metrics.snapshot()
    assert snap["served"] == 6 and snap["batches"] == 2
    assert snap["max_occupancy"] == 4 and snap["errors"] == 0
    assert snap["p50_ms"] is not None


def test_microbatcher_propagates_errors():
    def run(batch):
        raise ValueError("boom")

    mb = MicroBatcher(run, max_batch=2, max_wait_ms=1.0)
    fut = mb.submit({"x": np.zeros((1,))})
    with pytest.raises(ValueError, match="boom"):
        fut.result(timeout=10)
    mb.close()
    assert mb.metrics.snapshot()["errors"] == 1


def test_microbatcher_close_flushes_pending():
    def run(batch):
        return batch["x"] + 1.0

    mb = MicroBatcher(run, max_batch=8, max_wait_ms=5000.0)
    fut = mb.submit({"x": np.zeros((1, 2))})
    mb.close()  # must execute the waiting partial batch, not drop it
    assert np.allclose(fut.result(timeout=10), 1.0)


@pytest.fixture(scope="module")
def gan_service():
    from maua_tpu.gan.stylegan2 import SG2Config
    from maua_tpu.gan.wrappers import StyleGAN2

    cfg = SG2Config(img_resolution=32, z_dim=16, w_dim=16, channel_base=1024, channel_max=32, num_fp16_res=0)
    svc = GANImageService(generator=StyleGAN2(cfg=cfg), max_batch=4, max_wait_ms=150.0)
    yield svc
    svc.close()


def test_gan_service_deterministic_and_truncated(gan_service):
    a = gan_service.submit({"seed": 3}).result(timeout=120)
    b = gan_service.submit({"seed": 3}).result(timeout=120)
    c = gan_service.submit({"seed": 4}).result(timeout=120)
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # truncation toward w_avg changes the frame but keeps it valid
    t = gan_service.submit({"seed": 3, "truncation": 0.2}).result(timeout=120)
    assert t.shape == a.shape and not np.array_equal(t, a)


def test_gan_service_png(gan_service):
    png = gan_service.render_png({"seed": 0})
    assert png.startswith(PNG_MAGIC)


def test_gan_service_batches_concurrent_requests(gan_service):
    futs = [gan_service.submit({"seed": s}) for s in range(4)]
    outs = [f.result(timeout=120) for f in futs]
    assert len({o.tobytes() for o in outs}) == 4  # all distinct
    assert gan_service.metrics.snapshot()["max_occupancy"] >= 2


def test_http_server(gan_service):
    server = make_http_server({"gan": gan_service}, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/gan",
            data=json.dumps({"seed": 7, "truncation": 0.9}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "image/png"
            assert resp.read().startswith(PNG_MAGIC)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["gan"]["served"] >= 1
        # unknown service -> 404 with the route list
        req = urllib.request.Request(f"http://127.0.0.1:{port}/v1/nope", data=b"{}")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_diffusion_service_batches_distinct_prompts():
    from maua_tpu.diffusion.models import unet as unet_mod
    from maua_tpu.diffusion.models import vae as vae_mod
    from maua_tpu.diffusion.processors.stable import StableDiffusion
    from maua_tpu.serve import DiffusionImageService
    from maua_tpu.text.clip_text import CLIPTextConfig

    proc = StableDiffusion(
        sampler="euler",
        timesteps=3,
        image_size=32,
        unet_cfg=unet_mod.UNetConfig(
            in_channels=4, out_channels=4, model_channels=16, channel_mult=(1, 2),
            num_res_blocks=1, attention_resolutions=(2,), num_heads=2, context_dim=32,
            transformer_depth=1,
        ),
        vae_cfg=vae_mod.VAEConfig(base_channels=8, channel_mult=(1, 2), num_res_blocks=1, z_channels=4),
        text_cfg=CLIPTextConfig(width=32, layers=1, heads=2, context_length=8),
    )
    svc = DiffusionImageService(processor=proc, max_batch=3, max_wait_ms=150.0)
    try:
        futs = [
            svc.submit({"text": "a red boat", "seed": 1}),
            svc.submit({"text": "a blue cube", "seed": 2}),
            svc.submit({"text": "a red boat", "seed": 1, "cfg_scale": 2.0}),
        ]
        a, b, c = [f.result(timeout=600) for f in futs]
        assert a.shape == (32, 32, 3) and a.dtype == np.uint8
        assert not np.array_equal(a, b)  # prompt/seed changes the image
        assert not np.array_equal(a, c)  # per-request cfg_scale is honored
        # determinism per (text, seed, scale) regardless of co-batching
        a2 = svc.submit({"text": "a red boat", "seed": 1}).result(timeout=600)
        assert np.array_equal(a, a2)
        assert svc.render_png({"text": "x", "seed": 0}).startswith(PNG_MAGIC)
    finally:
        svc.close()


def test_gan_service_mesh_sharded_matches_single_device(gan_service):
    import jax
    from jax.sharding import Mesh

    from maua_tpu.gan.stylegan2 import SG2Config
    from maua_tpu.gan.wrappers import StyleGAN2

    cfg = SG2Config(img_resolution=32, z_dim=16, w_dim=16, channel_base=1024, channel_max=32, num_fp16_res=0)
    mesh = Mesh(np.array(jax.devices("cpu")[:4]).reshape(4, 1), ("data", "tensor"))
    svc = GANImageService(generator=StyleGAN2(cfg=cfg), max_batch=6, max_wait_ms=150.0, mesh=mesh)
    try:
        # batch rounds down to a multiple of the data axis
        assert svc._batcher.max_batch == 4
        futs = [svc.submit({"seed": s}) for s in range(4)]
        sharded = [f.result(timeout=120) for f in futs]
        # same params (PRNGKey(0) init in both wrappers) -> sharded
        # serving must match the unsharded service up to one uint8
        # quantization step (partitioned conv reduction order)
        ref = [gan_service.submit({"seed": s}).result(timeout=120) for s in range(4)]
        for s, r in zip(sharded, ref):
            assert np.abs(s.astype(np.int16) - r.astype(np.int16)).max() <= 1
    finally:
        svc.close()


def test_upscale_service_roundtrip():
    import base64
    import io

    from PIL import Image

    svc = UpscaleService("waifu2x-anime-noise0")  # smallest registered net
    try:
        img = (np.random.RandomState(0).rand(12, 10, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        payload = {"image": base64.b64encode(buf.getvalue()).decode()}
        out = svc.submit(payload).result(timeout=300)
        scale = svc.upscaler.scale
        assert out.shape == (12 * scale, 10 * scale, 3)
        assert svc.render_png(payload).startswith(PNG_MAGIC)
    finally:
        svc.close()


def test_service_metrics_percentiles():
    m = ServiceMetrics()
    for ms in [1, 2, 3, 4, 100]:
        m.record_request(ms / 1e3)
    snap = m.snapshot()
    assert snap["served"] == 5
    assert snap["p50_ms"] == pytest.approx(3.0, abs=0.5)
    assert snap["p95_ms"] > 50
