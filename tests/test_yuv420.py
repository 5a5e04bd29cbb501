"""On-device RGB->I420 conversion + yuv420p rawvideo pipe.

The yuv420p path halves device->host frame bytes (the measured e2e
bottleneck through the relay, PERFORMANCE.md) and hands ffmpeg frames
in its encode colorspace directly (`maua/ops/video.py:42-77` piped
rgb24 and let swscale convert on the host).
"""

import numpy as np
import pytest

from maua_tpu.ops.video import VideoWriter, ffmpeg_available, read_video, rgb_to_yuv420, write_video


def _reference_yuv420(rgb):
    """NumPy oracle: BT.601 limited-range matrix (validated bit-exact
    against cv2 COLOR_RGB2YUV_I420 luma/chroma at full resolution) with
    2x2 mean chroma subsampling."""
    H, W = rgb.shape[1:3]
    x = rgb.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    luma = 16.0 + y * (219.0 / 255.0)
    cb = 128.0 + (b - y) * (224.0 / 255.0 * 0.5 / (1.0 - 0.114))
    cr = 128.0 + (r - y) * (224.0 / 255.0 * 0.5 / (1.0 - 0.299))
    sub = lambda c: c.reshape(-1, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    to8 = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)
    flat = np.concatenate(
        [to8(luma).reshape(len(rgb), -1), to8(sub(cb)).reshape(len(rgb), -1), to8(sub(cr)).reshape(len(rgb), -1)],
        axis=1,
    )
    return flat.reshape(len(rgb), 3 * H // 2, W)


def test_rgb_to_yuv420_matches_numpy_oracle():
    rgb = np.random.RandomState(0).randint(0, 256, (3, 16, 24, 3), np.uint8)
    out = np.asarray(rgb_to_yuv420(rgb))
    ref = _reference_yuv420(rgb)
    assert out.shape == (3, 24, 24)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_rgb_to_yuv420_luma_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rgb = np.random.RandomState(1).randint(0, 256, (2, 32, 32, 3), np.uint8)
    out = np.asarray(rgb_to_yuv420(rgb))
    ref = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in rgb])
    assert np.abs(out[:, :32].astype(int) - ref[:, :32].astype(int)).max() <= 1


def test_rgb_to_yuv420_rejects_odd_dims():
    with pytest.raises(ValueError):
        rgb_to_yuv420(np.zeros((1, 15, 16, 3), np.uint8))


@pytest.mark.skipif(not ffmpeg_available(), reason="needs ffmpeg binary")
def test_yuv420_pipe_matches_rgb24_pipe(tmp_path):
    """Encoding pre-converted I420 frames yields (near) the same video
    as piping rgb24 and letting ffmpeg convert."""
    t, h, w = 8, 32, 48
    ramp = np.linspace(0, 255, t * h * w * 3).reshape(t, h, w, 3)
    frames = (ramp + np.random.RandomState(2).uniform(-20, 20, ramp.shape)).clip(0, 255).astype(np.uint8)

    rgb_file = str(tmp_path / "rgb.mp4")
    write_video(frames, rgb_file, fps=8, value_range=(0, 255))

    yuv_file = str(tmp_path / "yuv.mp4")
    planar = np.asarray(rgb_to_yuv420(frames))
    with VideoWriter(yuv_file, (w, h), fps=8, pix_fmt="yuv420p") as v:
        for f in planar:
            v.write(f.tobytes())

    a, _ = read_video(rgb_file)
    b, _ = read_video(yuv_file)
    assert a.shape == b.shape == (t, h, w, 3)
    # identical content through two colorspace conversions + x264:
    # allow small mean drift (chroma siting/subsample filters differ)
    assert np.abs(a - b).mean() < 0.02


@pytest.mark.skipif(not ffmpeg_available(), reason="needs ffmpeg binary")
def test_render_yuv420_frames_feed_writer(tmp_path):
    """SG2 wrapper render(pix_fmt='yuv420p') yields (3H/2, W) planar
    frames whose bytes the yuv420p pipe accepts."""
    from maua_tpu.gan import stylegan2 as sg2
    from maua_tpu.gan.wrappers import StyleGAN2

    gen = StyleGAN2(cfg=sg2.SG2Config(img_resolution=32, img_channels=3))
    ws = gen.get_w_latents("0-4")  # seed ranges are end-exclusive: 4 latents
    frames = list(gen.render(ws, batch_size=2, pix_fmt="yuv420p"))
    res = gen.cfg.img_resolution
    assert all(f.shape == (3 * res // 2, res) and f.dtype == np.uint8 for f in frames)
    out = str(tmp_path / "render.mp4")
    with VideoWriter(out, (res, res), fps=8, pix_fmt="yuv420p") as v:
        for f in frames:
            v.write(f.tobytes())
    vid, _ = read_video(out)
    assert vid.shape == (4, res, res, 3)

    # rgb24 path renders the same content (YUV-decoded within tolerance)
    rgb_frames = np.stack(list(gen.render(ws, batch_size=2)))
    assert np.abs(vid * 255.0 - rgb_frames.astype(np.float64)).mean() < 6.0


def test_pipelined_frames_respects_valid_counts():
    from maua_tpu.ops.video import pipelined_frames

    batches = [
        (np.arange(16, dtype=np.uint8).reshape(2, 2, 2, 2), 2),
        (np.ones((2, 2, 2, 2), np.uint8), 1),  # padded tail: only 1 valid
    ]
    frames = list(pipelined_frames(iter(batches)))
    assert len(frames) == 3
    assert frames[0].shape == (2, 2, 2)
    # bare batches (no counts) yield every frame
    assert len(list(pipelined_frames(iter([np.zeros((3, 2, 2, 3), np.uint8)])))) == 3


def test_ffmpeg_renderer_falls_back_on_odd_dims(tmp_path):
    """Odd frame sizes can't be I420: the FFMPEG renderer must fall
    back to the rgb24 pipe (whose pad filter handles them) instead of
    crashing (regression: yuv default broke odd --out_size)."""
    from maua_tpu.audiovisual.render import FFMPEG
    from maua_tpu.gan import stylegan2 as sg2
    from maua_tpu.gan.wrappers import StyleGAN2

    gen = StyleGAN2(cfg=sg2.SG2Config(img_resolution=32, img_channels=3), output_size=(31, 31))
    ws = gen.get_w_latents("0-4")
    out = str(tmp_path / "odd.mp4")
    renderer = FFMPEG(out, fps=4, batch_size=2, pix_fmt="yuv420p")
    video_file = renderer(gen.render, {"latent_w_plus": ws})
    vid, _ = read_video(video_file)
    assert vid.shape[0] == 4
