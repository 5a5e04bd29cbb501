"""Tests for dataset utilities, interactive session, realtime module,
profiling (reference: maua/dataset/, maua/audiovisual/interactive.py,
render/gpu2gl.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_multicrop_dataset():
    from maua_tpu.dataset import MultiCropDataset

    rs = np.random.RandomState(0)
    imgs = rs.rand(8, 32, 32, 3).astype(np.float32)
    ds = MultiCropDataset(imgs, size_crops=(16, 8), n_crops=(2, 3), batch_size=4)
    crops = next(iter(ds))
    assert len(crops) == 5
    assert crops[0].shape == (4, 16, 16, 3)
    assert crops[2].shape == (4, 8, 8, 3)
    for c in crops:
        assert np.all(np.isfinite(np.asarray(c)))


def test_image_ranker():
    from maua_tpu.dataset import ImageRanker
    from maua_tpu.perceptors.clip import AestheticPerceptor, CLIPVisionConfig

    p = AestheticPerceptor(vision_cfg=CLIPVisionConfig(image_size=32, patch_size=8, width=64, layers=1,
                                                        heads=2, embed_dim=32))
    ranker = ImageRanker(perceptor=p)
    imgs = np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32) * 2 - 1
    order = ranker.rank(imgs, prompt="test")
    assert sorted(order.tolist()) == [0, 1, 2, 3]


def test_laion_requires_a_prompt():
    from maua_tpu.dataset.ranker import laion_clip_retrieval

    with pytest.raises(ValueError):
        laion_clip_retrieval()  # no text/image/url prompt


def test_interactive_session():
    from maua_tpu.audiovisual.interactive import InteractiveSession

    sr = 22050
    t = np.arange(sr * 3) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    sess = InteractiveSession(audio, sr, segmentation={0.0: 0, 1.5: 1}, seed=1,
                              palette_size=6, latent_dim=16)
    assert set(sess.patches) == {0, 1}
    msg = sess.apply("more_intense", 0)
    assert "more_intense" in msg
    msg = sess.apply("different_style_motion", 0)
    assert "style_motion" in msg
    lats, noises = sess.preview(0, noise_sizes=[4])
    assert lats.ndim == 3

    # scripted REPL (section 0: two commands then next; section 1: quit)
    script = iter(["more_intense", "next", "quit"])
    outputs = []
    sess.repl(input_fn=lambda _: next(script), print_fn=outputs.append)
    assert any("more_intense" in str(o) for o in outputs)


def test_realtime_module():
    from maua_tpu.audiovisual.realtime import RealtimeModule, run_realtime

    def synth(ws):
        return jnp.tanh(ws[:, 0, :3])[:, None, None, :] * jnp.ones((1, 8, 8, 3))

    mod = RealtimeModule(synth, num_ws=2, w_dim=16, momentum=0.5, step_size=1.0)
    f1 = mod.frame()
    for _ in range(5):
        f2 = mod.frame()
    assert f1.shape == (8, 8, 3) and f1.dtype == np.uint8
    assert not np.array_equal(f1, f2)  # the walk moves

    frames = []
    run_realtime(synth, 2, 16, frame_callback=frames.append, max_frames=3, target_fps=1000)
    assert len(frames) == 3


def test_stage_timer():
    from maua_tpu.profiling import StageTimer

    t = StageTimer(sync=False)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_experimental_gan_models():
    from maua_tpu.gan import models_experimental as me

    key = jax.random.PRNGKey(0)
    gp = me.init_dcgan_g(key, z_dim=16, base=8, resolution=32)
    img = me.dcgan_g(gp, jnp.zeros((2, 16)))
    assert img.shape == (2, 32, 32, 3)
    dp = me.init_dcgan_d(key, base=8, resolution=32)
    logits = me.dcgan_d(dp, img)
    assert logits.shape == (2, 1)

    hp = me.init_hypermixer_g(key, z_dim=16, dim=32, grid=4, depth=2, resolution=16)
    img2 = me.hypermixer_g(hp, jax.random.normal(key, (2, 16)), grid=4)
    assert img2.shape == (2, 16, 16, 3)

    # emerging conv roundtrip through the native inverse
    w = me.masked_emerging_weight(key, channels=3)
    x = np.random.RandomState(0).randn(1, 6, 6, 3).astype(np.float32)
    z = np.asarray(me.emerging_conv(jnp.asarray(x), w))
    x_rec = me.emerging_conv_inverse(z, w, is_upper=False)
    assert np.abs(x_rec - x).max() < 1e-3


def test_nima_perceptor():
    from maua_tpu.perceptors.clip import CLIPVisionConfig, NIMAPerceptor

    p = NIMAPerceptor(vision_cfg=CLIPVisionConfig(image_size=32, patch_size=8, width=32, layers=1,
                                                   heads=2, embed_dim=16))
    imgs = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    scores = np.asarray(p.score(imgs))
    assert scores.shape == (2,)
    assert np.all((scores >= 1) & (scores <= 10))


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import jax

    from maua_tpu.utility import enable_compilation_cache

    # disabled by default
    monkeypatch.delenv("MAUA_COMPILE_CACHE", raising=False)
    assert enable_compilation_cache() is False
    # opt-in via env var points jax at the directory
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("MAUA_COMPILE_CACHE", str(tmp_path / "cc"))
    try:
        assert enable_compilation_cache() is True
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    finally:
        # restore: later compiles in this process must not write into
        # the pytest tmp dir after it is cleaned up
        jax.config.update("jax_compilation_cache_dir", prev)


def test_no_module_scope_device_ops():
    """Module-scope jnp/jax.random calls dispatch a device op at import
    time, forcing backend init before the CLI can even print --help
    (and hanging outright if the accelerator transport is down)."""
    import ast
    import pathlib

    import maua_tpu

    root = pathlib.Path(maua_tpu.__file__).parent
    offenders = []
    for f in root.rglob("*.py"):
        tree = ast.parse(f.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign) and node.col_offset == 0:
                for call in ast.walk(node.value):
                    if isinstance(call, ast.Call):
                        s = ast.unparse(call.func)
                        if s.startswith(("jnp.", "jax.numpy", "jax.random", "jax.device")):
                            offenders.append(f"{f.relative_to(root)}:{node.lineno}: {s}")
    assert not offenders, offenders
