"""End-to-end audio-reactive pipeline tests (BASELINE config 5 slice):
wav -> envelopes -> patch -> latents/noise -> synthesis -> frames.
(reference: maua/audiovisual/generate.py:16-54 + example patch)."""

import os

import numpy as np
import pytest

import jax

from maua_tpu.audio import latent as L
from maua_tpu.audiovisual import audioreactive as ar
from maua_tpu.audiovisual.patches import primitives as prim
from maua_tpu.gan import stylegan2 as sg2
from maua_tpu.gan.wrappers import RenderConfig, StyleGAN2, get_z_latents, layer_names

SR = 22050
CFG32 = sg2.SG2Config(img_resolution=32, channel_base=2048, channel_max=64, num_fp16_res=0)


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    from scipy.io import wavfile

    t = np.arange(SR * 3) / SR
    y = 0.4 * np.sin(2 * np.pi * 220 * t)
    for i in range(0, len(y), SR // 2):  # clicks at 120 bpm
        y[i : i + 128] += np.hanning(128) * 0.5
    path = tmp_path_factory.mktemp("audio") / "test.wav"
    wavfile.write(path, SR, (y * 32767).astype(np.int16))
    return str(path)


def test_spline_loops_passes_through_knots():
    rs = np.random.RandomState(0)
    y = rs.randn(4, 3, 8).astype(np.float32)
    out = np.asarray(L.spline_loops(y, 41, 1))
    assert out.shape == (41, 3, 8)
    # knots at t = k/4 (5 knots incl wrap) -> indices 0, 10, 20, 30, 40
    for i, idx in enumerate([0, 10, 20, 30]):
        assert np.allclose(out[idx], y[i], atol=1e-4), idx
    assert np.allclose(out[40], y[0], atol=1e-4)  # loops back


def test_slerp_loops_contiguous_segments():
    rs = np.random.RandomState(1)
    y = rs.randn(3, 2, 16).astype(np.float32)
    out = np.asarray(L.slerp_loops(y, 60, 1))
    assert out.shape == (60, 2, 16)
    assert np.all(np.isfinite(out))
    # start is the first latent (normalized direction match)
    a = out[0, 0] / np.linalg.norm(out[0, 0])
    b = y[0, 0] / np.linalg.norm(y[0, 0])
    assert np.dot(a, b) > 0.99


def test_single_multi_weighted():
    rs = np.random.RandomState(2)
    lats = rs.randn(3, 4, 8).astype(np.float32)
    env = np.linspace(0, 1, 10).astype(np.float32)
    sw = np.asarray(L.single_weighted(lats[0], lats[1], env))
    assert sw.shape == (10, 4, 8)
    assert np.allclose(sw[0], lats[0], atol=1e-6)
    assert np.allclose(sw[-1], lats[1], atol=1e-6)
    envs = np.abs(rs.rand(10, 3)).astype(np.float32)
    mw = np.asarray(L.multi_weighted(lats, envs))
    assert mw.shape == (10, 4, 8)


def test_get_z_latents_seed_parity():
    z = get_z_latents("1,5-8")
    assert z.shape == (4, 512)
    assert np.allclose(z[0], np.random.RandomState(1).randn(1, 512), atol=1e-6)
    assert np.allclose(z[1], np.random.RandomState(5).randn(1, 512), atol=1e-6)


def test_primitives_shapes():
    rs = np.random.RandomState(3)
    lats = rs.randn(5, 4, 8).astype(np.float32)
    assert prim.loop_latents(lats, 20, "spline").shape == (20, 4, 8)
    assert prim.loop_latents(lats, 20, "gaussian").shape == (20, 4, 8)
    assert prim.loop_latents(lats, 1).shape == (1, 4, 8)
    chroma = np.abs(rs.rand(16, 12)).astype(np.float32)
    assert prim.tonal_latents(chroma, lats).shape == (16, 4, 8)
    noise = prim.loop_noise(12, 16, 2.0)
    assert noise.shape == (12, 16, 16, 1)
    assert prim.tonal_noise(chroma, 8).shape == (16, 8, 8, 1)
    ms = prim.modulation_sum(
        [prim.Modulated(lats, np.abs(rs.rand(5)).astype(np.float32)),
         prim.Modulated(lats * 2, np.abs(rs.rand(5)).astype(np.float32))],
        10,
    )
    assert ms.shape == (10, 4, 8)


def test_wrapper_resize_output():
    gan = StyleGAN2(cfg=CFG32, output_size=(48, 48), strategy="stretch", layer=2, dtype="float32")
    ws = gan.get_w_latents("1,2")
    img = gan.synthesizer(ws)
    assert img.shape == (2, 48, 48, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_wrapper_downscale_output():
    """Output sizes whose per-layer target rounds below one pixel
    (64^2 from a 1024 model at layer 0 → const would shrink to 0x0)
    must fall back to a final-image resize, never produce empty
    frames (regression: CLI --out_size smaller than native)."""
    gan = StyleGAN2(cfg=CFG32, output_size=(4, 4), strategy="stretch", layer=0, dtype="float32")
    ws = gan.get_w_latents("3")
    img = np.asarray(gan.synthesizer(ws))
    assert img.shape == (1, 4, 4, 3)
    assert np.all(np.isfinite(img)) and img.std() > 0
    frames = list(gan.render(ws, batch_size=2))
    assert frames[0].shape == (4, 4, 3) and frames[0].size > 0


def test_wrapper_motion_mods():
    gan = StyleGAN2(cfg=CFG32, dtype="float32")
    ws = gan.get_w_latents("7")
    base = np.asarray(gan.synthesizer(ws))
    trans = np.asarray(gan.synthesizer(ws, translation=np.array([[0.25, 0.0]], np.float32)))
    zoomed = np.asarray(gan.synthesizer(ws, zoom=np.array([1.5], np.float32)))
    rot = np.asarray(gan.synthesizer(ws, rotation=np.array([45.0], np.float32)))
    for other in (trans, zoomed, rot):
        assert other.shape == base.shape
        assert not np.allclose(other, base)


def test_noise_pyramid_shapes():
    gan = StyleGAN2(cfg=CFG32, dtype="float32")
    noise = np.random.RandomState(0).randn(6, 16, 16, 1).astype(np.float32)
    pyr = gan.make_noise_pyramid(noise)
    names = layer_names(CFG32)[1:]
    for name, n in pyr.items():
        res = int(name.split(".")[0][1:])
        assert n.shape == (6, res, res, 1)
        assert abs(float(np.asarray(n).std(axis=(1, 2, 3)).mean()) - 1.0) < 0.2


def test_render_loop_yields_frames():
    gan = StyleGAN2(cfg=CFG32, dtype="float32")
    ws = gan.mapper(np.random.RandomState(0).randn(3, 512).astype(np.float32))
    lats = np.tile(np.asarray(ws[:1]), (7, 1, 1))
    frames = list(gan.render(lats, batch_size=4))
    assert len(frames) == 7
    assert frames[0].shape == (32, 32, 3)
    assert frames[0].dtype == np.uint8


def test_ar_envelopes_from_wav(wav_file):
    from maua_tpu.audio.io import load_audio

    audio, sr, dur = load_audio(wav_file, cache=False)
    assert sr == SR and abs(dur - 3.0) < 0.01
    n_frames = 24 * 3
    ons = np.asarray(ar.onsets(audio, sr, n_frames, margin=2, clip=95, smooth=2))
    assert ons.shape == (n_frames,)
    assert ons.max() <= 1 + 1e-5
    loud = np.asarray(ar.rms(audio, sr, n_frames, smooth=5, clip=95))
    assert loud.shape == (n_frames,)
    ch = np.asarray(ar.chroma(audio, sr, n_frames, type="stft"))
    assert ch.shape == (n_frames, 12)


def test_end_to_end_patch_render(wav_file, tmp_path):
    """Mini end-to-end: patch -> memmap renderer -> video array."""
    from maua_tpu.audiovisual.generate import generate_audiovisual_from_patch

    patch_code = '''
import numpy as np
import jax.numpy as jnp
from maua_tpu.audiovisual.patches.base import StyleGAN2Patch
from maua_tpu.audiovisual import audioreactive as ar
from maua_tpu.gan import stylegan2 as sg2


class TinyPatch(StyleGAN2Patch):
    def __init__(self, model_file, audio_file, **kw):
        kw["output_size"] = (32, 32)
        kw.setdefault("cfg", sg2.SG2Config(img_resolution=32, channel_base=2048, channel_max=64, num_fp16_res=0))
        kw.setdefault("dtype", "float32")
        super().__init__(model_file, audio_file, **kw)

    def process_audio(self):
        self.onset_env = ar.onsets(self.audio, self.sr, self.n_frames, margin=0, smooth=2, type="rosa")

    def process_mapper_inputs(self):
        return {"z": self.stylegan2.get_z_latents("1,2")}

    def process_synthesizer_inputs(self, latent_w):
        lats = ar.single_weighted(latent_w[0], latent_w[1], self.onset_env)
        return {"latent_w_plus": lats}
'''
    patch_file = tmp_path / "tiny_patch.py"
    patch_file.write_text(patch_code)

    video, (audio, sr) = generate_audiovisual_from_patch(
        audio_file=wav_file,
        model_file=None,
        patch_file=str(patch_file),
        renderer="memmap",
        renderer_kwargs={"batch_size": 8},
        fps=4,
        out_size=(32, 32),
    )
    assert video.shape == (12, 32, 32, 3)
    assert video.dtype == np.uint8
    assert video.std() > 1.0  # non-degenerate frames

    # same patch through the FFMPEG renderer (ffmpeg pipe, or the cv2
    # fallback on hosts without the binary) — the production encode
    # path incl. pix_fmt selection + double-buffered render generator
    out_file = str(tmp_path / "e2e.mp4")
    video_file, _ = generate_audiovisual_from_patch(
        audio_file=wav_file,
        model_file=None,
        patch_file=str(patch_file),
        renderer="ffmpeg",
        renderer_kwargs={"batch_size": 8, "output_file": out_file},
        fps=4,
        out_size=(32, 32),
    )
    from maua_tpu.ops.video import read_video

    decoded, _ = read_video(video_file)
    assert decoded.shape == (12, 32, 32, 3)
    assert np.asarray(decoded).std() > 0.01


def test_render_sharded_over_mesh():
    """Frame batches shard over the mesh `data` axis and match the
    unsharded render exactly."""
    from maua_tpu.parallel.mesh import make_mesh

    gan = StyleGAN2(cfg=CFG32, dtype="float32")
    ws = gan.mapper(np.random.RandomState(1).randn(2, 512).astype(np.float32))
    lats = np.tile(np.asarray(ws[:1]), (10, 1, 1))
    ref = np.stack(list(gan.render(lats, batch_size=8)))
    mesh = make_mesh(8)
    out = np.stack(list(gan.render(lats, batch_size=8, mesh=mesh)))
    assert out.shape == ref.shape
    assert np.array_equal(out, ref)


def test_noise_parameterization_patch(wav_file):
    """Example patch parity: rotating perlin annulus noise pyramid +
    envelope-mixed latents render through the SG2 wrapper
    (`patches/examples/noise_parameterization.py:43-128`)."""
    from maua_tpu.audiovisual.patches.examples.noise_parameterization import NoiseParameterization
    from maua_tpu.gan.stylegan2 import SG2Config

    cfg = SG2Config(img_resolution=32, z_dim=16, w_dim=16, channel_base=512,
                    channel_max=32, num_fp16_res=0, dtype="float32")
    patch = NoiseParameterization(None, wav_file, fps=2, duration=1, output_size=(32, 32), cfg=cfg)
    patch.process_audio()
    ws = patch.mapper(**patch.process_mapper_inputs())
    si = patch.process_synthesizer_inputs(ws)
    assert si["latent_w_plus"].shape[0] == patch.n_frames
    noises = {k: v for k, v in si.items() if k.startswith("b")}
    frames = list(patch.stylegan2.render(si["latent_w_plus"], noises=noises, batch_size=2))
    assert len(frames) == patch.n_frames
    assert np.all(np.isfinite(np.stack(frames)))

def test_example_patch_files_load_dynamically(tmp_path):
    """The shipped example patches must load through the user-file
    path (`get_patch_from_file`), including from a copy outside the
    package tree — this is the CLI flow and requires absolute imports
    inside the patch files (regression: relative imports broke it)."""
    import shutil

    from maua_tpu.audiovisual.patches.base import get_patch_from_file

    src_dir = os.path.join(os.path.dirname(__file__), "..", "maua_tpu", "audiovisual", "patches", "examples")
    for name in ["stylegan2.py", "stylegan3.py", "noise_parameterization.py"]:
        # in-tree path
        cls = get_patch_from_file(os.path.join(src_dir, name))
        assert cls is not None
        # user-copied path outside the package
        dst = tmp_path / ("user_" + name)
        shutil.copy(os.path.join(src_dir, name), dst)
        cls2 = get_patch_from_file(str(dst))
        assert cls2.__name__ == cls.__name__


def test_eerp_copeerp_endpoints():
    """Exponential and co-exponential interpolation endpoints
    (`maua/audiovisual/audioreactive/latent.py:46-54`)."""
    import jax.numpy as jnp

    a, b = jnp.asarray(2.0), jnp.asarray(8.0)
    assert np.allclose(L.eerp(a, b, 0.0), 2.0)
    assert np.allclose(L.eerp(a, b, 1.0), 8.0)
    assert np.allclose(L.eerp(a, b, 0.5), 4.0)  # geometric midpoint
    # copeerp: t=0 -> a^0 (1-1)/(1-1+1) = 0; monotone, finite on (0,1)
    ts = jnp.linspace(0.0, 1.0, 9)
    vals = np.asarray(L.copeerp(jnp.asarray(0.5), jnp.asarray(0.25), ts))
    assert np.all(np.isfinite(vals))
    assert np.allclose(vals[0], 0.0)
