"""OOM guard-rail tests: inject fake RESOURCE_EXHAUSTED errors and
observe recovery (reference fallbacks: maua/super/image/single.py:91-96,
maua/GAN/wrappers/stylegan2.py:204-211, maua/diffusion/image.py:171-177)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.oom import is_oom_error, run_with_oom_fallback


def _oom():
    return RuntimeError("RESOURCE_EXHAUSTED: Out of memory while trying to allocate 1234 bytes")


def test_is_oom_error():
    assert is_oom_error(_oom())
    assert is_oom_error(MemoryError())
    assert not is_oom_error(ValueError("shape mismatch"))


def test_run_with_oom_fallback_walks_ladder():
    calls = []

    def attempt(name, fail):
        def thunk():
            calls.append(name)
            if fail:
                raise _oom()
            return name

        return (name, thunk)

    out = run_with_oom_fallback([attempt("a", True), attempt("b", True), attempt("c", False)], verbose=False)
    assert out == "c"
    assert calls == ["a", "b", "c"]


def test_run_with_oom_fallback_reraises_other_errors():
    with pytest.raises(ValueError):
        run_with_oom_fallback([("x", lambda: (_ for _ in ()).throw(ValueError("boom")))])


def test_upscaler_tile_ladder(monkeypatch):
    """Full-image OOM -> tiled retry -> result still correct shape."""
    from maua_tpu.super.image import Upscaler

    up = Upscaler("waifu2x-anime-noise0", tile=0)
    real_run = up._run
    state = {"fails": 1}

    def flaky(img):
        if state["fails"] > 0:
            state["fails"] -= 1
            raise _oom()
        return real_run(img)

    monkeypatch.setattr(up, "_run", flaky)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 160, 160, 3)).astype(np.float32))
    out = up(img)
    assert out.shape == (1, 160 * up.scale, 160 * up.scale, 3)
    assert state["fails"] == 0  # the OOM rung was actually hit


def test_upscaler_lanczos_last_resort(monkeypatch):
    from maua_tpu.super.image import Upscaler

    up = Upscaler("waifu2x-anime-noise0", tile=0)

    def always_oom(img):
        raise _oom()

    monkeypatch.setattr(up, "_run", always_oom)
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 160, 160, 3)).astype(np.float32))
    out = up(img)  # falls through every tile rung to lanczos
    assert out.shape == (1, 160 * up.scale, 160 * up.scale, 3)


def test_render_halves_batch(monkeypatch):
    from maua_tpu.gan import stylegan2 as sg2
    from maua_tpu.gan.wrappers import StyleGAN2

    g = StyleGAN2(
        cfg=sg2.SG2Config(img_resolution=32, z_dim=32, w_dim=32, channel_base=1024, channel_max=32,
                          num_fp16_res=0),
    )
    ws = g.get_w_latents("0")
    latents = jnp.repeat(jnp.asarray(ws), 8, axis=0)

    real_synth = g.synthesizer
    state = {"fails": 1, "batch_sizes": []}

    def flaky(lat, **kw):
        state["batch_sizes"].append(lat.shape[0])
        if state["fails"] > 0:
            state["fails"] -= 1
            raise _oom()
        return real_synth(lat, **kw)

    monkeypatch.setattr(g, "synthesizer", flaky)
    frames = list(g.render(latents, batch_size=8))
    assert len(frames) == 8
    assert state["batch_sizes"][0] == 8 and 4 in state["batch_sizes"]


def test_diffusion_tile_batch_halves(monkeypatch):
    """image_sample's tile loop halves max_batch on OOM and completes."""
    from maua_tpu.diffusion.image import MultiResolutionDiffusionProcessor

    calls = {"sizes": [], "fails": 1}

    class FakeDiffusion:
        image_size = 32

        def __call__(self, img, prompts, t_start, verbose=False, key=None):
            calls["sizes"].append(img.shape[0])
            if calls["fails"] > 0:
                calls["fails"] -= 1
                raise _oom()
            return img

    proc = MultiResolutionDiffusionProcessor()
    out = proc(
        FakeDiffusion(), init="random", schedule={(64, 64): 0.5}, tile_size=32, stitch=True,
        max_batch=4, verbose=False,
    )
    assert out.shape[1:3] == (64, 64)
    assert calls["fails"] == 0
    assert 2 in calls["sizes"]  # halved after the injected OOM
